#!/usr/bin/env python
"""Headline benchmark: SSD300-VGG16 batch-1 inference FPS on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}`` on
stdout, always (diagnostics go to stderr). Baseline: the SSD paper's 46 FPS
batch-1 on Titan X (BASELINE.md) — the reference repo reimplements that
model; vs_baseline = our_fps / 46. Reference latency path: ``demo.py -t
time`` / ``lib/ssds.py:~100`` (SURVEY.md §3.3).

Fault isolation: the tunneled TPU backend intermittently FAULTS while
compiling large fresh programs, and a faulted device stays wedged for the
whole owning process. So every measurement stage runs in its OWN
subprocess (``python bench.py --stage <name>``); a wedged device dies with
its child and the orchestrator moves on. Stage ladder, best first:

  fused  — whole predict path (mean-sub, bf16 conv fwd, decode, NMS, top-k)
           in ONE jitted program. Fastest (fewest launches) but its compile
           is the one that faults the backend most often.
  split  — forward | detect as two chained programs; compiles reliably.
  train  — jitted train-step throughput at batch 32; honest degraded mode
           when no inference program will compile (vs_baseline=-1: no
           published train baseline exists).

If everything fails, a value-0 line is printed so the driver always parses
a result.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 46.0  # SSD paper, Titan X, batch 1
STAGE_TIMEOUT_S = 1500  # first big compile through the tunnel can take minutes
FAULT_COOLDOWN_S = 60  # tunneled backend recovers from a fault in ~1 min


# --------------------------------------------------------------------------
# stages (each runs in its own subprocess; prints ONE json line on success)
# --------------------------------------------------------------------------

def _stage_inference(fused: bool, size: int = 300, batch: int = 1,
                     int8: bool = False):
    os.environ["SSDS_TPU_FUSED_PREDICT"] = "1" if fused else "0"
    import statistics

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.config import cfg_from_file, default_config
    from ssds_tpu.detector import ObjectDetector

    if size == 512:
        here = os.path.dirname(os.path.abspath(__file__))
        cfg = cfg_from_file(
            os.path.join(here, "experiments/cfgs/ssd_vgg16_train_voc_512.yml"))
        cfg.RESUME_CHECKPOINT = ""
    else:
        cfg = default_config()
        cfg.MODEL.SSDS = "ssd"
        cfg.MODEL.NETS = "vgg16"
    det = ObjectDetector(cfg)
    if int8:
        n_q = det.quantize_int8()
        print(f"# int8-quantized {n_q} conv kernels", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    x = jnp.asarray(img)

    # warmup (compile happened in the constructor; still warm the caches)
    for _ in range(10):
        det._predict(det.variables, x)
    jax.device_get(jnp.sum(jnp.asarray(det._predict(det.variables, x), jnp.float32)))

    def sync(out):
        jax.device_get(jnp.sum(jnp.asarray(out, jnp.float32)))

    # Pipelined dispatch: JAX queues async step submissions so the
    # host->device round-trip overlaps with device compute. Sync with a
    # device_get of a reduction (this tunneled backend's block_until_ready
    # can return early), and cancel the constant dispatch+RTT overhead by
    # differencing a 2N-iteration run against an N-iteration run.
    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = det._predict(det.variables, x)
        sync(out)
        return time.perf_counter() - t0

    run(20)
    # Median-of-5 with spread: the tunneled chip varies ±20% run-to-run on
    # this quantity (BENCH_NOTES), so the artifact carries its own error bar.
    n_meas = 100 if batch == 1 else 20
    samples = sorted((run(2 * n_meas) - run(n_meas)) / n_meas for _ in range(5))
    per_step = statistics.median(samples)
    spread_pct = 100.0 * (samples[-1] - samples[0]) / per_step
    fps = batch / per_step

    # Per-call p50/p90 latency, one synced call at a time (reference
    # demo.py -t time / lib/ssds.py:~100 timing mode). Includes the ~27 ms
    # host<->device tunnel RTT of this environment — an on-host client
    # would see dispatch+compute only.
    mode = "fused" if fused else "split"
    if int8:
        mode += " int8-PTQ"
    out = {
        "metric": f"ssd{size}_vgg16_batch{batch}_fps",
        "value": round(fps, 2),
        "unit": f"images/sec (batch-{batch}, pipelined, one chip, {mode} "
                "predict; median of 5)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "spread_pct": round(spread_pct, 1),
    }
    if batch == 1:
        lat = []
        for _ in range(50):
            t0 = time.perf_counter()
            sync(det._predict(det.variables, x))
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        out["p50_ms"] = round(lat[len(lat) // 2], 2)
        out["p90_ms"] = round(lat[int(len(lat) * 0.9)], 2)
        out["p50_note"] = "per-call synced latency incl ~27ms tunnel RTT"
    print(json.dumps(out), flush=True)


def _stage_train():
    import jax
    import jax.numpy as jnp
    import optax

    from ssds_tpu.compile_cache import enable_compile_cache
    from ssds_tpu.config import default_config

    enable_compile_cache()  # inference stages get it via ObjectDetector
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
        "unit": "images/sec (full jitted train step: bf16 fwd, vmapped match, "
                "multibox loss, grad, sgd+momentum; batch 32, one chip)",
        "vs_baseline": -1,
    }), flush=True)


STAGES = {
    "fused": lambda: _stage_inference(fused=True),
    "split": lambda: _stage_inference(fused=False),
    "fused512": lambda: _stage_inference(fused=True, size=512),
    "split512": lambda: _stage_inference(fused=False, size=512),
    "serve32": lambda: _stage_inference(fused=True, batch=32),
    "int8_32": lambda: _stage_inference(fused=True, batch=32, int8=True),
    "int8_b1": lambda: _stage_inference(fused=True, batch=1, int8=True),
    "train": _stage_train,
}


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _run_stage(name: str):
    """Run one stage in a fresh subprocess; return its parsed json or None."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", name],
            capture_output=True, text=True, timeout=STAGE_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        print(f"# stage {name}: timed out after {STAGE_TIMEOUT_S}s",
              file=sys.stderr, flush=True)
        return None
    except Exception as e:  # noqa: BLE001 — must never crash the orchestrator
        print(f"# stage {name}: spawn failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr[-2000:])
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                if "metric" in parsed and "value" in parsed:
                    return parsed
            except json.JSONDecodeError:
                pass
    print(f"# stage {name}: rc={proc.returncode}, no json line",
          file=sys.stderr, flush=True)
    return None


def main():
    # Stage ladder with per-stage retries. Each attempt is a fresh process,
    # so a backend fault in one attempt cannot wedge the next; we still sleep
    # between attempts because the *device side* of the tunnel needs ~1 min
    # to recover from a kernel fault.
    ladder = [("fused", 2), ("split", 2), ("train", 2)]
    result = None
    for name, attempts in ladder:
        for attempt in range(attempts):
            result = _run_stage(name)
            if result is not None:
                break
            if attempt + 1 < attempts:
                time.sleep(FAULT_COOLDOWN_S)
        if result is not None:
            break
        time.sleep(FAULT_COOLDOWN_S)
    if result is None:
        result = {
            "metric": "ssd300_vgg16_batch1_fps",
            "value": 0,
            "unit": "images/sec (ALL bench stages failed — backend unavailable; "
                    "see stderr)",
            "vs_baseline": 0,
        }
    elif "batch1" in result.get("metric", ""):
        # Secondary stages, attached to the primary line; a failure here
        # never blocks the primary result.
        # SSD512 batch-1 (BASELINE.json names both SSD300 and SSD512):
        for name in ("fused512", "split512"):
            extra = _run_stage(name)
            if extra is not None:
                result["ssd512"] = extra
                break
            time.sleep(FAULT_COOLDOWN_S)
        # Train-step throughput (VERDICT r3: the train number must reach a
        # driver-scored artifact, not only BENCH_NOTES):
        extra = _run_stage("train")
        if extra is not None:
            result["train"] = extra
        # Batch-32 serving throughput, bf16 and int8-PTQ (the quantized
        # serving path, ssds_tpu/quant.py — beyond-parity capability;
        # no reference equivalent, SURVEY.md §2.9):
        for name, key in (("serve32", "serve_b32"), ("int8_32", "serve_b32_int8")):
            extra = _run_stage(name)
            if extra is not None:
                result[key] = extra
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        STAGES[sys.argv[2]]()
    else:
        try:
            main()
        except Exception as e:  # noqa: BLE001 — the json line must always print
            print(f"# orchestrator error: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            print(json.dumps({
                "metric": "ssd300_vgg16_batch1_fps", "value": 0,
                "unit": "images/sec (orchestrator error — see stderr)",
                "vs_baseline": 0,
            }), flush=True)
