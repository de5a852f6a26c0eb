"""FSSD / RFB overfit convergence: the remaining acceptance head families.

test_overfit.py proves ssd_lite converges and test_yolo_overfit.py proves
yolo v2/v3; fssd and rfb only had loss-is-finite train-step smokes
(test_heads_train.py). This closes that gap the same way: train on one
fixed synthetic batch, require the loss to halve AND the eval+detect path
to recover a planted box. Reference head recipes: lib/modeling/ssds/fssd.py
(transform -> upsample -> concat -> BN -> pyramid) and rfb.py (BasicRFB
dilation branches), SURVEY.md §2.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.postprocess import PostProcessConfig, detect
from ssds_tpu.solver import TrainState, build_train_step

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def make_cfg(ssds):
    cfg = default_config()
    cfg.MODEL.SSDS = ssds
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 3  # background + 2
    if ssds.startswith("fssd"):
        cfg.MODEL.FEATURE_LAYER = [
            [[5, 11, 13], [64, 128, 256]],
            [["", "S", "S"], [128, 128, 128]],
        ]
    else:  # rfb: stride-8 source gets BasicRFB_a, 'R'/'S' extras
        cfg.MODEL.FEATURE_LAYER = [[5, "R", "S"], [64, 256, 128]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2, 3], [2]]
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95]
    cfg.MODEL.HALF_PRECISION = False
    return cfg


def synth_batch(b=4):
    """Dark images with one bright rectangle each; class id 0."""
    rng = np.random.default_rng(11)
    images = np.full((b, 96, 96, 3), -60.0, np.float32)
    boxes = np.zeros((b, 4, 4), np.float32)
    labels = np.zeros((b, 4), np.int32)
    valid = np.zeros((b, 4), bool)
    for i in range(b):
        x1, y1 = rng.uniform(0.1, 0.4, 2)
        w, h = rng.uniform(0.3, 0.45, 2)
        x2, y2 = min(x1 + w, 0.95), min(y1 + h, 0.95)
        px = (np.array([x1, y1, x2, y2]) * 96).astype(int)
        images[i, px[1]:px[3], px[0]:px[2], :] = 90.0
        boxes[i, 0] = [x1, y1, x2, y2]
        valid[i, 0] = True
    return {
        "images": jnp.asarray(images), "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels), "valid": jnp.asarray(valid),
    }


def iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


@pytest.mark.parametrize("ssds", ["fssd", "rfb_lite"])
def test_head_overfit_recovers_box(ssds):
    cfg = make_cfg(ssds)
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL, jax.random.PRNGKey(2))

    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(3e-3))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx)
    assert state.batch_stats, f"{ssds} should carry batch_stats"
    step_fn = build_train_step(model, priors, False, (96, 96), jnp.float32)
    batch = synth_batch()

    losses = []
    for i in range(150):
        state, m = step_fn(state, batch)
        if i % 25 == 0:
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] / 2, f"{ssds} loss did not drop: {losses}"

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], phase="eval", train=False)
    post = PostProcessConfig(num_classes=3, score_threshold=0.2,
                             iou_threshold=0.45, max_detections=10)
    dets = np.asarray(detect(out[0], out[1], priors, post))
    gt = np.asarray(batch["boxes"][0, 0])
    best = dets[0, 1, 0]  # image 0, class 1 (label 0 + background offset)
    assert best[0] > 0.2, f"{ssds}: no confident detection: {best}"
    assert iou(best[1:], gt) > 0.5, f"{ssds}: box mismatch {best[1:]} vs {gt}"
