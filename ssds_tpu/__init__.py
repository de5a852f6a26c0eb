"""ssds_tpu — a TPU-native single-shot object-detection framework in JAX.

A ground-up rebuild of the capabilities of ``ShuangXieIrene/ssds.pytorch``
(SSD / SSDLite / FSSD / RFB / YOLO heads over VGG / ResNet / MobileNet /
DarkNet backbones, VOC/COCO data + eval, YAML experiment configs, train /
eval / demo entry points) designed idiomatically for TPU:

- flax/linen NHWC models compiled by XLA (fused conv+BN+ReLU, bf16 MXU path)
- vectorized, vmapped detection math (anchors / matching / multibox loss)
- fixed-shape greedy NMS (Pallas kernel + lax reference implementation)
- ``jax.sharding.Mesh`` + jit-with-shardings data parallelism over ICI
- msgpack checkpointing with ``checkpoint_list.txt``-compatible manifests,
  scoped resume, and a torch ``.pth`` importer
- native C++ host data-plane kernels (``native/``) for the augmentation
  sampling hot loop

See SURVEY.md at the repo root for the structural analysis of the reference
that this package is built to (component inventory in §2).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (avoids importing jax/flax for config-only use)."""
    if name in ("Solver", "train_model", "test_model"):
        from ssds_tpu import solver

        return getattr(solver, name)
    if name == "ObjectDetector":
        from ssds_tpu.detector import ObjectDetector

        return ObjectDetector
    if name in ("cfg", "cfg_from_file", "cfg_from_list"):
        from ssds_tpu import config

        return getattr(config, name)
    if name == "create_model":
        from ssds_tpu.models.builder import create_model

        return create_model
    raise AttributeError(name)
