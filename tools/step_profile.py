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

    # Direct xplane parse (the tensorboard_plugin_profile converter is
    # broken against this image's protobuf/tensorflow pairing) — same
    # approach as tools/serve_profile.py.
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    xs.ParseFromString(open(xplanes[-1], "rb").read())
    plane = max((pl for pl in xs.planes if pl.name != "/host:CPU"),
                key=lambda pl: sum(len(ln.events) for ln in pl.lines))
    ev_meta, stat_meta = plane.event_metadata, plane.stat_metadata
    rows2 = defaultdict(lambda: [0.0, 0, 0, ""])  # ms, flops, bytes, src
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            m = ev_meta[ev.metadata_id]
            st = {stat_meta[s.metadata_id].name:
                  (s.str_value or s.int64_value or s.uint64_value)
                  for s in m.stats}
            r = rows2[m.name]
            r[0] += ev.duration_ps / 1e9
            r[1] = st.get("flops", 0)
            r[2] = st.get("bytes_accessed", 0)
            r[3] = str(st.get("source", ""))
    total = sum(v[0] for v in rows2.values())
    print(f"# device XLA-op self time: {total / 10:.2f} ms/step")
    print(f"{'op':56s} {'ms':>7s} {'TF/s':>6s} {'GB/s':>6s}  src")
    for name, (ms, fl, by, src) in sorted(
            rows2.items(), key=lambda kv: -kv[1][0])[:28]:
        ms_step = ms / 10
        tfs = (fl / 1e12) / (ms_step / 1e3) if fl and ms_step else 0
        gbs = (by / 1e9) / (ms_step / 1e3) if by and ms_step else 0
        print(f"{name[:56]:56s} {ms_step:7.3f} {tfs:6.1f} {gbs:6.0f}  "
              f"{src.split('/')[-1]}")


if __name__ == "__main__":
    main()
