#!/usr/bin/env python
"""Per-op profile of the SSD300 train step on the TPU.

Captures a jax.profiler trace of N steps and prints the top-k ops by
self-time (parsed with tensorboard_plugin_profile's xplane converter).
Usage: python tools/step_profile.py [--s2d=N] [batch]
"""
import glob
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, create_priors, init_model
from ssds_tpu.solver import TrainState, build_train_step


def main():
    from ssds_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()  # tools recompile through the tunnel otherwise
    args = sys.argv[1:]
    s2d = -1
    if args and args[0].startswith("--s2d="):
        s2d = int(args.pop(0).split("=")[1])
    bs = int(args[0]) if args else 32

    cfg = default_config()
    cfg.MODEL.S2D_STEM = s2d
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    # production optimizer (configure_optimizer: flat fast path / multi_transform)
    from ssds_tpu.solver import configure_lr_scheduler, configure_optimizer
    tx = configure_optimizer(cfg.TRAIN, configure_lr_scheduler(cfg.TRAIN, 100))(
        variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 50, (bs, 300, 300, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (bs, 16, 1)),
        "labels": jnp.ones((bs, 16), jnp.int32),
        "valid": jnp.zeros((bs, 16), bool).at[:, :2].set(True),
    }
    step = build_train_step(model, priors, False, (300, 300), jnp.bfloat16)
    for _ in range(5):
        state, m = step(state, batch)
    jax.block_until_ready(m)

    logdir = "/tmp/step_profile"
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    jax.profiler.stop_trace()

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    data, _ = rtd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data) if data.lstrip().startswith("[") else None
    if rows is None:
        # gviz csv fallback
        print(data[:3000])
        return
    # rows: list of dicts with 'occurrences','total_time','avg_time',... keys
    print(f"{'op':60s} {'total_ms':>9s} {'%':>5s}")
    total = sum(r.get("total_self_time_us", r.get("total_self_time", 0.0))
                for r in rows if isinstance(r, dict))
    for r in sorted(rows, key=lambda r: -r.get("total_self_time_us",
                                               r.get("total_self_time", 0.0)))[:25]:
        t = r.get("total_self_time_us", r.get("total_self_time", 0.0))
        name = (r.get("operation", r.get("op_name", "?")))[:60]
        print(f"{name:60s} {t / 1e3 / 10:9.3f} {100 * t / max(total, 1):5.1f}")


if __name__ == "__main__":
    main()
