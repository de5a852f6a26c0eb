#!/usr/bin/env python
"""Headline benchmark: SSD300-VGG16 batch-1 inference FPS on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.
Baseline: the SSD paper's 46 FPS batch-1 on Titan X (BASELINE.md) — the
reference repo reimplements that model; vs_baseline = our_fps / 46.

The timed program is the full predict path in one jitted function (mean-sub,
bf16 conv forward, decode, per-class NMS, top-k), uint8 in / dense
detections out — the reference's ObjectDetector.predict equivalent minus
host-side image resize.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 46.0  # SSD paper, Titan X, batch 1


def _train_fallback():
    import jax.numpy as jnp
    import numpy as np_
    import optax

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.solver import TrainState, build_train_step

    cfg = default_config()
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    bs = 32
    batch = {
        "images": jnp.zeros((bs, 300, 300, 3), jnp.uint8),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (bs, 16, 1)),
        "labels": jnp.ones((bs, 16), jnp.int32),
        "valid": jnp.zeros((bs, 16), bool).at[:, :2].set(True),
    }
    tx = optax.sgd(0.001, momentum=0.9)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats={}, opt_state=tx.init(variables["params"]), tx=tx)
    step = build_train_step(model, priors, False, (300, 300), jnp.bfloat16,
                            pixel_means=(104, 117, 123))
    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "ssd300_vgg16_train_imgs_per_sec",
        "value": round(bs / dt, 2),
        "unit": "images/sec (train step, batch 32, one chip; inference bench "
                "unavailable — backend faulted on its compile)",
        "vs_baseline": -1,
    }))


def main():
    from ssds_tpu.config import default_config
    from ssds_tpu.detector import ObjectDetector

    cfg = default_config()
    cfg.MODEL.SSDS = "ssd"
    cfg.MODEL.NETS = "vgg16"
    # The tunneled TPU backend occasionally faults on large fresh compiles
    # (UNAVAILABLE/ABORTED "kernel fault"); retry a few times before giving up.
    det = None
    for attempt in range(4):
        try:
            det = ObjectDetector(cfg)
            break
        except Exception as e:
            print(f"# attempt {attempt + 1} failed: {type(e).__name__}", flush=True)
            time.sleep(60)  # tunneled backend recovers from faults in ~1 min
    if det is None:
        # Degraded mode: the inference-program compile keeps faulting the
        # backend. Report the TRAIN-step throughput instead (its compile has
        # been reliable) — honestly labeled, vs_baseline=-1 (no published
        # train baseline exists).
        _train_fallback()
        return

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 300, 300, 3), dtype=np.uint8)
    x = jnp.asarray(img)

    # warmup (compile happened in the constructor; still warm the caches)
    for _ in range(10):
        jax.block_until_ready(det._predict(det.variables, x))

    # Pipelined dispatch: JAX queues async step submissions so the
    # host->device round-trip overlaps with device compute; blocking once at
    # the end measures true device throughput. (In this environment the
    # device is reached through a tunnel with ~27 ms RTT — per-call blocking
    # would measure the tunnel, not the TPU.)
    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = det._predict(det.variables, x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    run(20)
    per_step = min(run(100) for _ in range(3))
    fps = 1.0 / per_step

    print(json.dumps({
        "metric": "ssd300_vgg16_batch1_fps",
        "value": round(fps, 2),
        "unit": "images/sec (batch-1, pipelined, one chip)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
