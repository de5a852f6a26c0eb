"""Solver-unit tests: LR schedules, scope freezing, checkpoint round-trip,
and one sharded train step on the 8-device CPU mesh (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssds_tpu import checkpoint as ckpt_lib
from ssds_tpu.config import default_config
from ssds_tpu.solver import (
    TrainState,
    build_train_step,
    configure_lr_scheduler,
    configure_optimizer,
    trainable_mask,
)

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def train_cfg(**lr_kwargs):
    cfg = default_config()
    for k, v in lr_kwargs.items():
        cfg.TRAIN.LR_SCHEDULER[k] = v
    return cfg.TRAIN


def test_lr_step_schedule():
    tc = train_cfg(SCHEDULER="step", STEPS=[10], GAMMA=0.5, WARM_UP_EPOCHS=0)
    sched = configure_lr_scheduler(tc, steps_per_epoch=100)
    base = float(tc.OPTIMIZER.LEARNING_RATE)
    assert float(sched(0)) == pytest.approx(base)
    assert float(sched(999)) == pytest.approx(base)  # epoch 9.99
    assert float(sched(1000)) == pytest.approx(base * 0.5)  # epoch 10
    assert float(sched(2000)) == pytest.approx(base * 0.25)


def test_lr_multi_step_and_warmup():
    tc = train_cfg(SCHEDULER="multi_step", STEPS=[5, 8], GAMMA=0.1, WARM_UP_EPOCHS=2)
    sched = configure_lr_scheduler(tc, steps_per_epoch=10)
    base = float(tc.OPTIMIZER.LEARNING_RATE)
    # warm-up: linear over 20 steps
    assert float(sched(0)) == pytest.approx(base * 1 / 20)
    assert float(sched(19)) == pytest.approx(base, rel=1e-3)
    assert float(sched(30)) == pytest.approx(base)      # epoch 3
    assert float(sched(50)) == pytest.approx(base * 0.1)   # epoch 5
    assert float(sched(80)) == pytest.approx(base * 0.01)  # epoch 8


def test_lr_sgdr_restarts():
    tc = train_cfg(SCHEDULER="sgdr", STEPS=[10], LR_MIN=0.0, WARM_UP_EPOCHS=0)
    sched = configure_lr_scheduler(tc, steps_per_epoch=10)
    base = float(tc.OPTIMIZER.LEARNING_RATE)
    assert float(sched(0)) == pytest.approx(base)
    # mid-period: half amplitude
    assert float(sched(50)) == pytest.approx(base / 2, rel=1e-3)
    # restart at period boundary
    assert float(sched(100)) == pytest.approx(base, rel=1e-3)


def test_trainable_mask_freezes_out_of_scope():
    params = {
        "base_layers_0": {"kernel": jnp.zeros((1,))},
        "head": {"loc0": {"kernel": jnp.zeros((1,))}, "conf0": {"kernel": jnp.zeros((1,))}},
        "norm": {"scale": jnp.zeros((1,))},
    }
    labels = trainable_mask(params, "loc,conf")
    assert labels["head"]["loc0"]["kernel"] == "train"
    assert labels["head"]["conf0"]["kernel"] == "train"
    assert labels["base_layers_0"]["kernel"] == "freeze"
    assert labels["norm"]["scale"] == "freeze"
    # scope matching nothing -> everything trains (fallback)
    labels = trainable_mask(params, "bogus_scope_word_zzz")
    assert labels["base_layers_0"]["kernel"] == "train"


def test_frozen_params_do_not_move():
    tc = train_cfg()
    tc.TRAINABLE_SCOPE = "loc"
    params = {
        "base_layers_0": {"kernel": jnp.ones((3,))},
        "head": {"loc0": {"kernel": jnp.ones((3,))}},
    }
    sched = configure_lr_scheduler(tc, 10)
    tx = configure_optimizer(tc, sched)(params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["base_layers_0"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["loc0"]["kernel"]).sum()) > 0.0


def test_checkpoint_roundtrip_and_scope(tmp_path):
    variables = {
        "params": {
            "base_layers_0": {"kernel": np.ones((2, 2), np.float32)},
            "head": {"loc0": {"kernel": np.full((2,), 3.0, np.float32)}},
        },
        "batch_stats": {},
    }
    path = ckpt_lib.save_checkpoint(str(tmp_path), "t", 7, variables)
    assert os.path.exists(path)
    found = ckpt_lib.find_previous(str(tmp_path))
    assert found and found[0] == [7]

    fresh = jax.tree_util.tree_map(np.zeros_like, variables)
    restored = ckpt_lib.resume_checkpoint(fresh, path, "")
    assert np.allclose(restored["params"]["base_layers_0"]["kernel"], 1.0)
    # scope-filtered graft: only base restored
    fresh = jax.tree_util.tree_map(np.zeros_like, variables)
    restored = ckpt_lib.resume_checkpoint(fresh, path, "base")
    assert np.allclose(restored["params"]["base_layers_0"]["kernel"], 1.0)
    assert np.allclose(restored["params"]["head"]["loc0"]["kernel"], 0.0)


def test_resume_preserves_empty_batch_stats(tmp_path):
    """BN-less models (e.g. ssd_vgg16) have batch_stats={}; flatten/unflatten
    drops empty dicts, so resume must re-attach every top-level collection
    (ADVICE round-1 high: restored['batch_stats'] raised KeyError)."""
    variables = {
        "params": {"w": {"kernel": np.ones((2,), np.float32)}},
        "batch_stats": {},
    }
    path = ckpt_lib.save_checkpoint(str(tmp_path), "t", 1, variables)
    restored = ckpt_lib.resume_checkpoint(variables, path, "")
    assert "batch_stats" in restored and restored["batch_stats"] == {}
    # scope-filtered graft path too
    restored = ckpt_lib.resume_checkpoint(variables, path, "base")
    assert "batch_stats" in restored


def test_sharded_train_step_8_devices():
    """The multi-chip path: batch sharded over an 8-device data mesh."""
    import __graft_entry__ as graft

    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)


def test_differential_learning_rate():
    tc = train_cfg()
    tc.TRAINABLE_SCOPE = ""
    tc.OPTIMIZER.OPTIMIZER = "sgd"
    tc.OPTIMIZER.MOMENTUM = 0.0
    tc.OPTIMIZER.WEIGHT_DECAY = 0.0
    tc.OPTIMIZER.DIFFERENTIAL_LEARNING_RATE = [["base", 0.1]]
    params = {
        "base_layers_0": {"kernel": jnp.ones((3,))},
        "head": {"loc0": {"kernel": jnp.ones((3,))}},
    }
    sched = configure_lr_scheduler(tc, 10)
    tx = configure_optimizer(tc, sched)(params)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    base_u = float(updates["base_layers_0"]["kernel"][0])
    head_u = float(updates["head"]["loc0"]["kernel"][0])
    assert base_u == pytest.approx(head_u * 0.1, rel=1e-5)


def test_scope_matching_is_not_overbroad():
    params = {
        "conf0": {"kernel": jnp.zeros((1,))},      # digit suffix: matches 'conf'
        "confusion": {"kernel": jnp.zeros((1,))},  # bare longer word: must NOT
        "norm": {"scale": jnp.zeros((1,))},
        "normalizer": {"scale": jnp.zeros((1,))},  # must NOT match 'norm'
    }
    labels = trainable_mask(params, "conf,norm")
    assert labels["conf0"]["kernel"] == "train"
    assert labels["norm"]["scale"] == "train"
    assert labels["confusion"]["kernel"] == "freeze"
    assert labels["normalizer"]["scale"] == "freeze"


def test_resume_continues_lr_schedule(tmp_path):
    """After auto-resume the step counter continues the schedule."""
    from ssds_tpu.config import default_config
    from ssds_tpu.solver import Solver

    cfg = default_config()
    cfg.TRAIN.LR_SCHEDULER.WARM_UP_EPOCHS = 5
    cfg.TRAIN.LR_SCHEDULER.SCHEDULER = "step"
    cfg.TRAIN.LR_SCHEDULER.STEPS = [1000]  # no decay inside this test
    solver = Solver.__new__(Solver)  # skip heavy init; test build_state only
    solver.cfg = cfg
    solver.start_epoch = 10
    solver.params = {"w": jnp.ones((2,))}
    solver.batch_stats = {}
    solver.build_state(steps_per_epoch=7)
    assert int(solver.state.step) == 70
    # past warm-up: schedule returns the base lr, not the warm-up ramp
    base = float(cfg.TRAIN.OPTIMIZER.LEARNING_RATE)
    assert float(solver.lr_schedule(int(solver.state.step))) == pytest.approx(base)


def test_spatial_mesh_from_config():
    """MESH.SPATIAL carves a second axis; data axis still divides batch."""
    from ssds_tpu.config import default_config
    from ssds_tpu.parallel.sharding import create_mesh

    cfg = default_config()
    cfg.TPU.MESH.SPATIAL = 2
    mesh = create_mesh(cfg.TPU, batch_size=8)
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.devices.shape == (4, 2)
    # spatial=1 default keeps all devices on data
    cfg2 = default_config()
    mesh2 = create_mesh(cfg2.TPU, batch_size=8)
    assert mesh2.devices.shape == (8, 1)


def test_spatially_sharded_step_matches_data_only():
    """GSPMD spatial partitioning (images P('data','spatial')) must produce
    the same loss as pure data sharding — halo exchanges are numerics-free."""
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.solver import TrainState, build_train_step

    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.2, 0.6, 0.9]
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL, jax.random.PRNGKey(0))
    tx = optax.sgd(0.01)

    rng = np.random.default_rng(3)
    batch = {
        "images": jnp.asarray(rng.normal(0, 40, (4, 64, 64, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (4, 4, 1)),
        "labels": jnp.ones((4, 4), jnp.int32),
        "valid": jnp.zeros((4, 4), bool).at[:, 0].set(True),
    }

    losses = {}
    for name, mesh_shape in (("data", (4, 1)), ("spatial", (2, 2))):
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        bstats = jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {}))
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bstats,
            opt_state=tx.init(params), tx=tx)
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(mesh_shape),
                    ("data", "spatial"))
        img_s = NamedSharding(mesh, P("data", "spatial"))
        dat_s = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        db = {k: jax.device_put(v, img_s if k == "images" else dat_s)
              for k, v in batch.items()}
        step = build_train_step(model, priors, False, (64, 64), jnp.float32)
        with mesh:
            _, m = step(state, db)
        losses[name] = float(m["loss"])
    assert losses["spatial"] == pytest.approx(losses["data"], rel=1e-5), losses


def test_remat_step_matches_plain():
    """TPU.REMAT wraps the forward in jax.checkpoint — the backward replays
    the identical ops, so loss, grads, and updated params must match the
    plain step (here: exactly same metrics, params allclose)."""
    import optax

    from ssds_tpu.models.builder import create_model, create_priors, init_model

    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.2, 0.6, 0.9]
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL, jax.random.PRNGKey(0))
    tx = optax.sgd(0.01, momentum=0.9)

    rng = np.random.default_rng(5)
    batch = {
        "images": jnp.asarray(rng.normal(0, 40, (2, 64, 64, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (2, 4, 1)),
        "labels": jnp.ones((2, 4), jnp.int32),
        "valid": jnp.zeros((2, 4), bool).at[:, 0].set(True),
    }

    results = {}
    for remat in (False, True):
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        bstats = jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {}))
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=bstats,
            opt_state=tx.init(params), tx=tx)
        step = build_train_step(model, priors, False, (64, 64), jnp.float32,
                                remat=remat)
        b = {k: jnp.copy(v) for k, v in batch.items()}
        state, m = step(state, b)
        results[remat] = (state, {k: float(v) for k, v in m.items()})

    assert results[True][1] == pytest.approx(results[False][1], rel=1e-6), results
    flat_p, _ = jax.tree_util.tree_flatten(results[False][0].params)
    flat_r, _ = jax.tree_util.tree_flatten(results[True][0].params)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
