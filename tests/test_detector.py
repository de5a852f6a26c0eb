"""ObjectDetector (demo path) on CPU with a tiny model: scale-back math,
thresholding, timing dict."""

import numpy as np

from ssds_tpu.config import default_config
from ssds_tpu.detector import ObjectDetector

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


def test_predict_shapes_and_scaleback():
    det = ObjectDetector(tiny_cfg())
    img = np.random.default_rng(0).integers(0, 255, (240, 320, 3), dtype=np.uint8)
    boxes, labels, scores = det.predict(img, threshold=0.0)
    assert boxes.shape[1] == 4
    assert len(labels) == len(scores) == boxes.shape[0]
    # pixel-frame scaling: coords are finite and of original-image magnitude
    # (decode does not clip — reference Detect doesn't either, so a
    # random-weight model can emit out-of-frame boxes)
    if len(boxes):
        assert np.isfinite(boxes).all()
        assert np.abs(boxes).max() < 10 * 320
        assert (labels >= 0).all() and (labels < 3).all()  # background dropped

    # high threshold on a random-weight model: typically nothing survives
    boxes_hi, labels_hi, scores_hi = det.predict(img, threshold=0.999)
    assert boxes_hi.shape[0] <= boxes.shape[0]

    (b2, l2, s2), times = det.predict(img, threshold=0.5, check_time=True)
    for k in ("preprocess", "forward_detect", "postfilter", "total"):
        assert times[k] >= 0.0


def test_predict_batch_matches_predict():
    """predict_batch over 4 differently-sized images (the batch>=4
    throughput path) must return, per image, the same detections as
    single-image predict — same set of (label, score, box) rows within
    float tolerance (different compiled programs may differ by ~1 ulp in
    decode)."""
    det = ObjectDetector(tiny_cfg())
    rng = np.random.default_rng(1)
    sizes = [(240, 320), (120, 160), (300, 300), (64, 200)]
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for h, w in sizes]
    batched = det.predict_batch(imgs, threshold=0.1)
    assert len(batched) == len(imgs)
    for img, (bb, bl, bs) in zip(imgs, batched):
        sb, sl, ss = det.predict(img, threshold=0.1)
        assert bb.shape == sb.shape and len(bl) == len(sl)
        # single predict emits in class-major order; batched emits
        # score-descending — compare as sorted row sets
        def rows(b, l, s):
            r = np.concatenate([s[:, None], l[:, None].astype(np.float32),
                                b], axis=1)
            return r[np.lexsort(r.T[::-1])]
        np.testing.assert_allclose(rows(bb, bl, bs), rows(sb, sl, ss),
                                   atol=1e-4)
