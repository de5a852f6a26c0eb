"""Post-training int8 quantization (ssds_tpu/quant.py).

Covers both int8 conv routes: the layers.Conv wrapper (backbone/extras/
lite heads) and the fused loc|conf prediction conv (heads/common.py).
Measured motivation on hardware (tools/int8_bench.py): SSD300 serving
1032 -> 1342 img/s at batch 32. No reference equivalent (ssds.pytorch
serves fp32; SURVEY.md §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssds_tpu import quant
from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, init_model

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def tiny_ssd_cfg():
    cfg = default_config()
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.FEATURE_LAYER = [[22, 34, "S"], [512, 1024, 512]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2]]
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95]
    cfg.MODEL.S2D_STEM = 0
    cfg.MODEL.HALF_PRECISION = False
    return cfg


@pytest.fixture(scope="module")
def quantized_ssd():
    cfg = tiny_ssd_cfg()
    model, _ = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 60, (2, 96, 96, 3)).astype(np.float32))

    def calib_apply(v, b):
        return model.apply(v, b, phase="eval", train=False,
                           mutable=["quant_calib"])

    amax = quant.collect_absmax(calib_apply, variables, [x])
    qvars = quant.quantize_variables(variables, amax)
    return cfg, model, variables, qvars, x, amax


def test_init_has_no_quant_collections():
    cfg = tiny_ssd_cfg()
    model, _ = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    assert set(variables.keys()) == {"params"}


def test_param_tree_structure_unchanged(quantized_ssd):
    _, _, variables, qvars, _, _ = quantized_ssd
    ref = jax.tree_util.tree_structure(variables["params"])
    assert jax.tree_util.tree_structure(qvars["params"]) == ref
    assert "quant" in qvars
    n = quant.num_quantized(qvars)
    assert n > 10  # backbone + extras + fused heads
    assert quant.num_quantized(variables) == 0


def test_int8_outputs_close_to_fp(quantized_ssd):
    _, model, variables, qvars, x, _ = quantized_ssd
    loc_f, conf_f = model.apply(variables, x, phase="eval", train=False)
    loc_q, conf_q = model.apply(qvars, x, phase="eval", train=False)
    # conf is post-softmax probabilities; loc is regression offsets
    assert float(jnp.max(jnp.abs(conf_f - conf_q))) < 0.08
    corr = float(jnp.corrcoef(conf_f.ravel(), conf_q.ravel())[0, 1])
    assert corr > 0.99
    denom = float(jnp.max(jnp.abs(loc_f))) + 1e-6
    assert float(jnp.max(jnp.abs(loc_f - loc_q))) / denom < 0.1


def test_skip_re_keeps_heads_fp(quantized_ssd):
    _, _, variables, _, _, amax = quantized_ssd
    qvars = quant.quantize_variables(variables, amax, skip_re=r"loc|conf")
    from flax import traverse_util
    flat = traverse_util.flatten_dict(qvars["params"])
    for key, v in flat.items():
        path = "/".join(key)
        if ("loc" in path or "conf" in path) and key[-1] == "kernel":
            assert v.dtype != jnp.int8, path
    assert quant.num_quantized(qvars) > 0  # backbone still int8


def test_skip_all_raises(quantized_ssd):
    _, _, variables, _, _, amax = quantized_ssd
    with pytest.raises(ValueError):
        quant.quantize_variables(variables, amax, skip_re=".")


def test_no_calib_stats_raises():
    with pytest.raises(ValueError):
        quant.collect_absmax(
            lambda v, b: (None, {"quant_calib": {}}), {}, [0])


def test_detector_quantize_int8_lite_head():
    """ObjectDetector integration on the lite (dw+pw) head path: depthwise
    kernels stay fp, pointwise go int8, predict still runs end to end."""
    from tests.test_detector import tiny_cfg
    from ssds_tpu.detector import ObjectDetector

    det = ObjectDetector(tiny_cfg())
    img = np.random.default_rng(1).integers(0, 255, (120, 160, 3),
                                            dtype=np.uint8)
    ref = det.predict(img, threshold=0.0)
    n = det.quantize_int8()
    assert n > 0
    from flax import traverse_util
    flat = traverse_util.flatten_dict(det.variables["params"])
    dw = [v for k, v in flat.items()
          if k[-1] == "kernel" and v.ndim == 4 and v.shape[2] == 1]
    assert dw and all(v.dtype != jnp.int8 for v in dw)  # depthwise stays fp
    boxes, labels, scores = det.predict(img, threshold=0.0)
    assert boxes.shape[1] == 4 and np.isfinite(boxes).all()
    # same candidate count order of magnitude as fp (loose: random weights)
    assert abs(len(scores) - len(ref[2])) <= max(10, len(ref[2]))


def test_batch_stats_models_quantize():
    """ConvBNReLU backbones (BN collections) quantize too (round-5: the
    BN block mirrors Conv's calib sow + int8 branch — the dequant epilogue
    runs before the eval-mode BN affine, no folding needed); batch_stats
    structure is untouched and outputs stay close to fp."""
    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v2_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.FEATURE_LAYER = [[7, 14], [96, 320]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.6, 0.9]
    cfg.MODEL.HALF_PRECISION = False
    model, _ = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 60, (1, 96, 96, 3)).astype(np.float32))

    def calib_apply(v, b):
        return model.apply(v, b, phase="eval", train=False,
                           mutable=["quant_calib"])

    amax = quant.collect_absmax(calib_apply, variables, [x])
    qvars = quant.quantize_variables(variables, amax)
    assert set(qvars.keys()) >= set(variables.keys())
    if "batch_stats" in variables:
        assert jax.tree_util.tree_structure(
            qvars["batch_stats"]) == jax.tree_util.tree_structure(
            variables["batch_stats"])
    out_f = model.apply(variables, x, phase="eval", train=False)
    out_q = model.apply(qvars, x, phase="eval", train=False)
    # Bound re-measured when ConvBNReLU quantization landed (round 5): a
    # RANDOM-weight fully-quantized backbone measures ~0.24 max conf diff
    # (random weights are PTQ's worst case — no calibration-representative
    # activation distribution). Trained-model accuracy is guarded by
    # test_int8_preserves_detections_after_overfit.
    assert float(jnp.max(jnp.abs(out_f[1] - out_q[1]))) < 0.5


def test_int8_preserves_detections_after_overfit():
    """Accuracy proof on the detection metric itself: overfit a tiny model
    to planted boxes (the offline mAP stand-in, tests/test_overfit.py),
    PTQ-quantize with the real training images as calibration, and assert
    the int8 model still recovers the planted box at the same IoU bar with
    a comparable score. Quantifies the quantization accuracy cost where it
    matters (detections), not just logit closeness."""
    from ssds_tpu.ops.postprocess import PostProcessConfig, detect
    from tests.test_overfit import iou, overfit_tiny_model

    model, priors, trained, batch, _ = overfit_tiny_model()

    def calib_apply(v, b):
        return model.apply(v, b, phase="eval", train=False,
                           mutable=["quant_calib"])

    # calibrate on the actual (preprocessed) training images
    amax = quant.collect_absmax(calib_apply, trained, [batch["images"]])
    qvars = quant.quantize_variables(trained, amax)
    assert quant.num_quantized(qvars) > 0

    post = PostProcessConfig(num_classes=3, score_threshold=0.2,
                             iou_threshold=0.45, max_detections=10)
    gt = np.asarray(batch["boxes"][0, 0])

    out_f = model.apply(trained, batch["images"], phase="eval", train=False)
    best_f = np.asarray(detect(out_f[0], out_f[1], priors, post))[0, 1, 0]
    out_q = model.apply(qvars, batch["images"], phase="eval", train=False)
    best_q = np.asarray(detect(out_q[0], out_q[1], priors, post))[0, 1, 0]

    assert best_f[0] > 0.2, f"fp model failed to overfit: {best_f}"
    assert best_q[0] > 0.2, f"int8 lost the detection: {best_q}"
    assert iou(best_q[1:], gt) > 0.5, f"int8 box drifted: {best_q[1:]} vs {gt}"
    # The docstring's claim ends above (detection recovered vs GT). The
    # fp-vs-int8 closeness below is informational: measured margins are
    # IoU(fp, int8) ~0.97 and |Δscore| ~0.02 on this seed; the assertion
    # bounds are deliberately loose (ADVICE r3: conv reduction order may
    # shift across JAX versions/backends).
    print(f"int8 vs fp: iou={iou(best_q[1:], best_f[1:]):.3f} "
          f"dscore={abs(best_q[0] - best_f[0]):.4f}")
    assert iou(best_q[1:], best_f[1:]) > 0.5, (best_q[1:], best_f[1:])
    assert abs(best_q[0] - best_f[0]) < 0.25, (best_q[0], best_f[0])


def test_bn_backbone_quantizes_whole_network():
    """A pure-ConvBNReLU model (darknet backbone, YOLO head) must quantize
    its BACKBONE convs, not just the plain-Conv head (round-5 gap: before
    the ConvBNReLU int8 branch only 1 of 23 quantizable kernels went int8
    on this config). Detections must survive quantization."""
    from ssds_tpu.detector import ObjectDetector

    cfg = default_config()
    cfg.MODEL.SSDS = "yolo_v2"
    cfg.MODEL.NETS = "darknet_19"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.FEATURE_LAYER = [[10, 12], [256, 512]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.5, 0.7]
    cfg.MODEL.HALF_PRECISION = False
    cfg.POST_PROCESS.NUM_CLASSES = 4
    det = ObjectDetector(cfg)
    img = np.random.default_rng(0).integers(0, 255, (120, 160, 3),
                                            dtype=np.uint8)
    _, _, s_fp = det.predict(img, threshold=0.0)
    n = det.quantize_int8()
    assert n >= 20, f"only {n} kernels quantized — BN convs not covered"
    boxes, labels, s_q = det.predict(img, threshold=0.0)
    assert np.isfinite(boxes).all()
    # random-weight model: top scores should track fp closely
    top_fp = np.sort(s_fp)[-10:]
    top_q = np.sort(s_q)[-10:]
    assert float(np.max(np.abs(top_fp - top_q))) < 0.1
