#!/usr/bin/env python
"""Hardware smoke of the BASELINE.json acceptance matrix on one real chip.

For each acceptance config: build the model from its yml, run 3 full
jitted train steps (synthetic batch, real image size) and one
ObjectDetector predict, and report the per-config throughput. Proves the
whole acceptance matrix COMPILES AND RUNS on TPU hardware, not only under
the CPU test suite. Reference matrix: BASELINE.json `configs`
(SURVEY.md §6 north-star table).

Usage: python tools/acceptance_smoke.py [cfg ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ACCEPTANCE = [
    "ssd_vgg16_train_voc.yml",
    "ssd_lite_mobilenetv2_train_coco.yml",
    "fssd_vgg16_train_voc.yml",
    "rfb_vgg16_train_voc.yml",
    "yolo_v3_darknet_53_train_voc.yml",
]


def smoke(name: str):
    from ssds_tpu.config import cfg_from_file
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.solver import (TrainState, build_train_step,
                                 configure_lr_scheduler, configure_optimizer)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = cfg_from_file(os.path.join(here, "experiments/cfgs", name))
    cfg.RESUME_CHECKPOINT = ""
    model, fmaps = create_model(cfg.MODEL)
    is_yolo = str(cfg.MODEL.SSDS).startswith("yolo")
    priors = None if is_yolo else jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    tx = configure_optimizer(cfg.TRAIN, configure_lr_scheduler(cfg.TRAIN, 100))(
        variables["params"])
    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    bs = 8
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(0, 50, (bs, h, w, 3)), jnp.float32),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (bs, 8, 1)),
        "labels": jnp.ones((bs, 8), jnp.int32),
        "valid": jnp.zeros((bs, 8), bool).at[:, :2].set(True),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    step = build_train_step(model, priors, is_yolo, (h, w), jnp.bfloat16)
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = step(state, batch)
    jax.device_get(m["loss"])
    compile_and_3 = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    loss = float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(loss), f"{name}: non-finite loss {loss}"

    # inference surface
    from ssds_tpu.detector import ObjectDetector
    det = ObjectDetector(cfg)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes, labels, scores = det.predict(img, threshold=0.0)
    print(f"{name}: train {bs/dt:.1f} img/s ({dt*1e3:.1f} ms/step, "
          f"loss {loss:.3f}, compile+3 {compile_and_3:.0f}s); "
          f"predict ok ({len(boxes)} dets)", flush=True)


def main():
    from ssds_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()  # tools recompile through the tunnel otherwise
    """Each config smokes in its OWN subprocess (bench.py's fault-isolation
    pattern: a wedged tunneled device dies with its child, the next config
    still gets a fresh client) with a hard per-config timeout."""
    import subprocess

    names = sys.argv[1:] or ACCEPTANCE
    failures = 0
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                timeout=1200, text=True, capture_output=True)
            out = (proc.stdout or "").strip()
            print(out if out else
                  f"{name}: FAILED rc={proc.returncode} "
                  f"{(proc.stderr or '')[-300:]}", flush=True)
            failures += 0 if proc.returncode == 0 else 1
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (1200s — backend wedged?)", flush=True)
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        smoke(sys.argv[2])
    else:
        main()
