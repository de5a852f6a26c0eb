"""Serving export round-trip: the jax.export'd fused predict program must
reload from disk and reproduce the in-process detector bit-for-bit, at
batch sizes beyond the export-time example (symbolic batch dim)."""

import json
import os

import numpy as np

from ssds_tpu.config import default_config
from ssds_tpu.detector import ObjectDetector
from ssds_tpu.export import export_detector, load_exported

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def tiny_cfg():
    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.6, 0.9]
    cfg.MODEL.HALF_PRECISION = False
    cfg.POST_PROCESS.NUM_CLASSES = 4
    cfg.POST_PROCESS.MAX_DETECTIONS = 10
    return cfg


def test_export_roundtrip_symbolic_batch(tmp_path):
    det = ObjectDetector(tiny_cfg())
    out = export_detector(det, str(tmp_path / "served"))
    for name in ("predict.shlo", "weights.msgpack", "export.json"):
        assert os.path.exists(os.path.join(out, name)), name

    predict, meta = load_exported(out)
    assert meta["batch"] == "symbolic"
    assert meta["image_size"] == [96, 96]

    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: sizes never seen at export time
        imgs = rng.integers(0, 255, (b, 96, 96, 3), dtype=np.uint8)
        served = np.asarray(predict(imgs))
        direct = np.asarray(det._predict(det.variables, imgs))
        assert served.shape == (b, 4, 10, 5)
        np.testing.assert_array_equal(served, direct)


def test_export_fixed_batch(tmp_path):
    det = ObjectDetector(tiny_cfg())
    out = export_detector(det, str(tmp_path / "served_b2"), batch=2)
    with open(os.path.join(out, "export.json")) as f:
        assert json.load(f)["batch"] == 2
    predict, _ = load_exported(out)
    imgs = np.random.default_rng(1).integers(0, 255, (2, 96, 96, 3),
                                             dtype=np.uint8)
    served = np.asarray(predict(imgs))
    direct = np.asarray(det._predict(det.variables, imgs))
    np.testing.assert_array_equal(served, direct)


def test_export_multi_platform(tmp_path):
    """One artifact lowered for BOTH tpu and cpu — exporting needs no TPU
    (jax.export lowers, it does not compile), so a CPU build host can emit
    the production serving artifact."""
    det = ObjectDetector(tiny_cfg())
    out = export_detector(det, str(tmp_path / "served_mp"),
                          platforms=("tpu", "cpu"))
    predict, meta = load_exported(out)
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    imgs = np.random.default_rng(2).integers(0, 255, (2, 96, 96, 3),
                                             dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(predict(imgs)),
        np.asarray(det._predict(det.variables, imgs)))


def test_export_yolo_head(tmp_path):
    """YOLO predict (anchors baked in, detect_decoded — no priors arg)
    exports and round-trips like the SSD family."""
    cfg = default_config()
    cfg.MODEL.SSDS = "yolo_v3"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FEATURE_LAYER = [[5, 11, 13], [64, 128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2], [2]]
    cfg.MODEL.ANCHORS = [[[8, 8]], [[24, 24]], [[48, 48]]]
    cfg.MODEL.HALF_PRECISION = False
    cfg.POST_PROCESS.NUM_CLASSES = 4  # classes + background for postprocess
    cfg.POST_PROCESS.MAX_DETECTIONS = 10
    det = ObjectDetector(cfg)
    out = export_detector(det, str(tmp_path / "served_yolo"))
    predict, _ = load_exported(out)
    imgs = np.random.default_rng(3).integers(0, 255, (2, 64, 64, 3),
                                             dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(predict(imgs)),
        np.asarray(det._predict(det.variables, imgs)))


def test_export_sharded_serving_matches_single_device(tmp_path):
    """One exported artifact served data-parallel over an 8-device mesh
    matches single-device serving (per-image independence of the whole
    predict program), and the output is actually sharded. Tolerance: the
    CPU backend's per-shard conv lowering reorders float reductions
    (measured max |Δ| ~6e-8, last ulp); the math is image-independent."""
    import jax
    from jax.sharding import Mesh

    from ssds_tpu.export import load_exported_sharded

    det = ObjectDetector(tiny_cfg())
    out = export_detector(det, str(tmp_path / "served"))

    predict_1, _ = load_exported(out)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    predict_8, meta = load_exported_sharded(out, mesh)
    assert meta["batch"] == "symbolic"

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
    sharded = predict_8(imgs)
    # the program really ran SPMD: the result is laid out over all 8 chips
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(predict_1(imgs)), atol=1e-6)

    # batch 16 on 8 devices: two images per chip, same contract
    imgs16 = rng.integers(0, 255, (16, 96, 96, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(predict_8(imgs16)), np.asarray(predict_1(imgs16)), atol=1e-6)


def test_export_int8_quantized(tmp_path):
    """The int8-PTQ serving path exports like the fp path: quantize first,
    then export — the artifact's weight blob carries the int8 kernels and
    the reloaded program is bit-identical to the in-process quantized
    detector. Completes the deploy chain for ssds_tpu/quant.py (no
    reference equivalent — ssds.pytorch serves fp32, SURVEY.md §2.9)."""
    det = ObjectDetector(tiny_cfg())
    n_q = det.quantize_int8()
    assert n_q > 0
    out = export_detector(det, str(tmp_path / "served_int8"))
    predict, meta = load_exported(out)

    # the artifact really ships int8 kernels, not a dequantized float copy.
    # Count only params-collection kernels (ADVICE r3: exact equality over
    # ALL tree leaves would break on any future int8-typed metadata even
    # though the contract — conv kernels ship as int8 — still held).
    import jax
    from flax import serialization
    with open(os.path.join(out, "weights.msgpack"), "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    kernel_dtypes = [
        np.dtype(getattr(v, "dtype", np.float32))
        for k, v in jax.tree_util.tree_leaves_with_path(restored["params"])
        if getattr(k[-1], "key", None) == "kernel"
    ]
    assert sum(d == np.int8 for d in kernel_dtypes) == n_q

    rng = np.random.default_rng(4)
    for b in (1, 3):
        imgs = rng.integers(0, 255, (b, 96, 96, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(predict(imgs)),
            np.asarray(det._predict(det.variables, imgs)))
