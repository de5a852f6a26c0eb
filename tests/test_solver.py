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
