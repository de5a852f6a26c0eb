"""Train-step smokes for the BN-heavy heads (fssd/rfb) and the YOLO Solver
path — the is_yolo branches of eval/detect that the SSD e2e never hits."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.ops.postprocess import PostProcessConfig, detect_decoded
from ssds_tpu.solver import TrainState, build_train_step

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def tiny_cfg(ssds, nets, fl, ars, image=96, num_classes=4):
    cfg = default_config()
    cfg.MODEL.SSDS = ssds
    cfg.MODEL.NETS = nets
    cfg.MODEL.IMAGE_SIZE = [image, image]
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.MODEL.FEATURE_LAYER = fl
    cfg.MODEL.ASPECT_RATIOS = ars
    cfg.MODEL.SIZES = [0.2, 0.5, 0.8, 0.95][: len(ars) + 1]
    return cfg


def one_step(cfg):
    model, fmaps = create_model(cfg.MODEL)
    is_yolo = str(cfg.MODEL.SSDS).startswith("yolo")
    priors = None if is_yolo else jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL, jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.sgd(0.005, momentum=0.9))
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx)
    h = cfg.MODEL.IMAGE_SIZE[0]
    step = build_train_step(model, priors, is_yolo, (h, h), jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 40, (2, h, h, 3)), jnp.float32),
        "boxes": jnp.asarray([[[0.2, 0.2, 0.6, 0.6]], [[0.1, 0.1, 0.5, 0.5]]]),
        "labels": jnp.zeros((2, 1), jnp.int32),
        "valid": jnp.ones((2, 1), bool),
    }
    state, m = step(state, batch)
    state, m = step(state, batch)
    return state, m


def test_fssd_train_step():
    fl = [[[22, 34], [512, 1024]], [["", "S", "0"], [128, 128, 128]]]
    cfg = tiny_cfg("fssd_lite", "mobilenet_v1_025",
                   [[[5, 11, 13], [64, 128, 256]], [["", "S", "S"], [128, 128, 128]]],
                   [[2], [2, 3], [2]])
    state, m = one_step(cfg)
    assert np.isfinite(float(m["loss"]))
    # BN batch_stats must be updated (mutable path exercised)
    assert state.batch_stats, "fssd should carry batch_stats"


def test_rfb_lite_train_step():
    cfg = tiny_cfg("rfb_lite", "mobilenet_v1_025", [[5, "R", "S"], [64, 256, 128]],
                   [[2], [2, 3], [2]])
    state, m = one_step(cfg)
    assert np.isfinite(float(m["loss"]))
    assert state.batch_stats


def test_yolo_eval_detect_path():
    """YOLO eval phase -> detect_decoded end to end (the Solver's is_yolo
    eval branch)."""
    cfg = tiny_cfg("yolo_v3", "mobilenet_v1_025", [[5, 11, 13], [64, 128, 256]],
                   [[2], [2], [2]], image=64)
    cfg.MODEL.ANCHORS = [[[8, 8]], [[24, 24]], [[48, 48]]]
    model, fmaps = create_model(cfg.MODEL)
    variables = init_model(model, cfg.MODEL, jax.random.PRNGKey(0))
    boxes, scores = model.apply(
        variables, jnp.zeros((2, 64, 64, 3)), phase="eval", train=False)
    post = PostProcessConfig(num_classes=4, score_threshold=0.01,
                             iou_threshold=0.45, max_detections=10)
    out = detect_decoded(boxes, scores, post)
    assert out.shape == (2, 4, 10, 5)
    assert np.isfinite(np.asarray(out)).all()
    # background row zeroed
    assert not np.asarray(out)[:, 0].any()


def test_resnet_backbone_train_step():
    """ResNet backbones (BN in every block) through the full train step —
    resnet was only forward-tested before; this exercises the mutable
    batch_stats path under grad like fssd/rfb above."""
    cfg = tiny_cfg("ssd", "resnet_18", [[4, 8, "S"], [128, 512, 256]],
                   [[2], [2, 3], [2]])
    state, m = one_step(cfg)
    assert np.isfinite(float(m["loss"]))
    assert state.batch_stats, "resnet should carry batch_stats"
