#!/usr/bin/env python
"""A/B the hard-negative-mining rank computation inside the REAL train step.

Variants (monkeypatched over ssds_tpu.ops.losses.hard_negative_ranks before
tracing, so the measurement is the full SSD300 batch-32 step, not a
microbench — per BENCH_NOTES, per-op self-times on this backend do not
predict step-time sensitivity):

  argsort — shipped double-argsort rank trick (2 sorts over [B,K])
  scatter — 1 sort + inverse-permutation scatter (bit-exact: the second
            argsort of a permutation IS its inverse)
  none    — no ranking at all (iota ranks; WRONG numbers, upper bound on
            what any rank rewrite could recover)

Usage: python tools/hnm_bench.py [argsort|scatter|none ...] [--bs=32]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ssds_tpu.ops.losses as losses_mod
from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.solver import TrainState, build_train_step, configure_lr_scheduler, \
    configure_optimizer


def ranks_argsort(loss_c):
    loss_idx = jnp.argsort(-loss_c, axis=1)
    return jnp.argsort(loss_idx, axis=1)


def ranks_scatter(loss_c):
    loss_idx = jnp.argsort(-loss_c, axis=1)

    def inv(p):
        iota = jnp.arange(p.shape[0], dtype=p.dtype)
        return jnp.zeros_like(p).at[p].set(iota, unique_indices=True)

    return jax.vmap(inv)(loss_idx)


def ranks_none(loss_c):
    b, k = loss_c.shape
    return (jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32), (b, k))
            + (loss_c * 0).astype(jnp.int32))


VARIANTS = {"argsort": ranks_argsort, "scatter": ranks_scatter,
            "none": ranks_none}


def measure(variant, bs):
    losses_mod.hard_negative_ranks = VARIANTS[variant]
    cfg = default_config()
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    schedule = configure_lr_scheduler(cfg.TRAIN, 100)
    tx = configure_optimizer(cfg.TRAIN, schedule)(variables["params"])
    params = jax.tree_util.tree_map(jnp.copy, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 50, (bs, 300, 300, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (bs, 16, 1)),
        "labels": jnp.ones((bs, 16), jnp.int32),
        "valid": jnp.zeros((bs, 16), bool).at[:, :2].set(True),
    }
    step = build_train_step(model, priors, False, (300, 300), jnp.bfloat16)
    for _ in range(3):
        state, m = step(state, batch)
    jax.device_get(m)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / n
    print(f"{variant}: batch={bs} {bs/dt:.1f} img/s ({dt*1e3:.1f} ms/step)",
          flush=True)


def main():
    from ssds_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()  # tools recompile through the tunnel otherwise
    args = sys.argv[1:]
    bs = 32
    variants = []
    for a in args:
        if a.startswith("--bs="):
            bs = int(a.split("=")[1])
        else:
            variants.append(a)
    # exactness cross-check on random data first (cheap, device-agnostic)
    rng = np.random.default_rng(0)
    lc = jnp.asarray(rng.normal(size=(4, 977)).astype(np.float32))
    lc = lc.at[:, ::7].set(0.0)  # ties
    np.testing.assert_array_equal(np.asarray(ranks_argsort(lc)),
                                  np.asarray(ranks_scatter(lc)))
    print("# scatter == argsort on random+ties: exact", flush=True)
    for v in variants or ["argsort", "scatter", "none"]:
        measure(v, bs)


if __name__ == "__main__":
    main()
