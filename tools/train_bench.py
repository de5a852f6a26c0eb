#!/usr/bin/env python
"""Training-throughput benchmark: SSD300-VGG16 images/sec on one chip.

Measures the full jitted train step (bf16 forward, vmapped matching,
multibox loss, grad, SGD update) with pipelined dispatch, synthetic batch.
Usage: python tools/train_bench.py [batch_size ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.solver import TrainState, build_train_step, configure_lr_scheduler, \
    configure_optimizer


def main():
    from ssds_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()  # tools recompile through the tunnel otherwise
    args = sys.argv[1:]
    s2d, stages = 0, 1
    while args and args[0].startswith("--"):
        if args[0].startswith("--s2d="):
            s2d = int(args.pop(0).split("=")[1])
        elif args[0].startswith("--stages="):
            stages = int(args.pop(0).split("=")[1])
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sizes = [int(a) for a in args] or [8, 16, 32, 64]
    cfg = default_config()
    cfg.MODEL.S2D_STEM = s2d
    cfg.MODEL.S2D_STAGES = stages
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    schedule = configure_lr_scheduler(cfg.TRAIN, 100)
    tx = configure_optimizer(cfg.TRAIN, schedule)(variables["params"])

    for bs in sizes:
        # fresh copies: the donated step consumes the previous state's buffers
        params = jax.tree_util.tree_map(jnp.copy, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params), tx=tx)
        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.normal(0, 50, (bs, 300, 300, 3)), jnp.float32),
            "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (bs, 16, 1)),
            "labels": jnp.ones((bs, 16), jnp.int32),
            "valid": jnp.zeros((bs, 16), bool).at[:, :2].set(True),
        }
        step = build_train_step(model, priors, False, (300, 300), jnp.bfloat16)
        for _ in range(3):  # compile + flush any aval churn
            state, m = step(state, batch)
        jax.device_get(m)  # device_get, not block_until_ready: the tunneled
        n = 30              # backend's block_until_ready can return early
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch)
        jax.device_get(m)
        dt = (time.perf_counter() - t0) / n
        print(f"batch={bs}: {bs/dt:.1f} img/s  ({dt*1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
