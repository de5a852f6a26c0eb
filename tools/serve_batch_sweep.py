#!/usr/bin/env python
"""Batch-size sweep past 32: does throughput keep rising?

The bench ladder pins serving AND training at batch 32 (the reference's
README-era batch-8 claims and our acceptance rows). But images/sec/chip is
the north star (BASELINE.json) and nothing ever measured whether 64/128
buys more MXU utilization on the fused predict or the train step. Each
(batch, dtype/mode) point runs in its OWN subprocess (the tunneled backend
wedges per-process on compile faults — bench.py's isolation pattern).

Usage: python tools/serve_batch_sweep.py [batches...]   (default 32 64 128)
       python tools/serve_batch_sweep.py --train [batches...]
       python tools/serve_batch_sweep.py --cfg experiments/cfgs/<x>.yml [batches...]
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_point(batch: int, int8: bool, train: bool = False,
              cfg: str | None = None) -> dict | None:
    if cfg:
        # arbitrary config: serve-only point via the acceptance-stage
        # measurement path (fused predict, robust sampling)
        code = (
            "import sys, json, time; sys.path.insert(0, %r); import os\n"
            "import bench\n"
            "import numpy as np\n"
            "from ssds_tpu.compile_cache import enable_compile_cache\n"
            "from ssds_tpu.config import cfg_from_file\n"
            "enable_compile_cache()\n"
            "os.environ['SSDS_TPU_FUSED_PREDICT'] = '1'\n"
            "cfg = cfg_from_file(os.path.join(%r, %r))\n"
            "cfg.RESUME_CHECKPOINT = ''\n"
            "h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)\n"
            "import jax.numpy as jnp\n"
            "from ssds_tpu.detector import ObjectDetector\n"
            "det = ObjectDetector(cfg)\n"
            "if %r: det.quantize_int8()\n"
            "b = %d\n"
            "x = jnp.asarray(np.random.default_rng(0).integers("
            "0, 255, (b, h, w, 3), dtype=np.uint8))\n"
            "for _ in range(5): det._predict(det.variables, x)\n"
            "bench._sync(det._predict(det.variables, x))\n"
            "def run(iters):\n"
            "    o = None\n"
            "    t0 = time.perf_counter()\n"
            "    for _ in range(iters): o = det._predict(det.variables, x)\n"
            "    bench._sync(o)\n"
            "    return time.perf_counter() - t0\n"
            "run(10)\n"
            "per_step, spread = bench._robust_measure(run, 15)\n"
            "print(json.dumps({'value': round(b / per_step, 2),"
            " 'spread_pct': spread,"
            " 'mfu': None if %r else bench._mfu("
            "bench._xla_flops(det._predict, det.variables, x), per_step)}))\n"
            % (REPO, REPO, cfg, int8, batch, int8)
        )
    elif train:
        code = (
            "import sys, json, time; sys.path.insert(0, %r); import bench\n"
            "from ssds_tpu.compile_cache import enable_compile_cache\n"
            "from ssds_tpu.config import default_config\n"
            "enable_compile_cache()\n"
            "bs = %d\n"
            "step, state, batch = bench._make_train_fixture(default_config(), bs)\n"
            "flops = bench._xla_flops(step, state, batch)\n"
            "per_step, spread = bench._measure_train(step, state, batch, bs, reps=15)\n"
            "print(json.dumps({'metric': 'train_b%%d' %% bs,"
            " 'value': round(bs / per_step, 2), 'spread_pct': spread,"
            " 'mfu': bench._mfu(flops, per_step)}))\n"
            % (REPO, batch)
        )
    else:
        code = (
            "import sys; sys.path.insert(0, %r); import bench; "
            "bench._stage_inference(fused=True, batch=%d, int8=%r)"
            % (REPO, batch, int8)
        )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1200, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        print(f"# b{batch} int8={int8}: timeout", file=sys.stderr, flush=True)
        return None
    if proc.stderr:
        sys.stderr.write(proc.stderr[-800:])
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    print(f"# b{batch} int8={int8}: rc={proc.returncode} no json",
          file=sys.stderr, flush=True)
    return None


def main():
    args = sys.argv[1:]
    train = "--train" in args
    args = [a for a in args if a != "--train"]
    cfg = None
    if "--cfg" in args:
        i = args.index("--cfg")
        cfg = args[i + 1]
        del args[i:i + 2]
    batches = [int(a) for a in args] or [32, 64, 128]
    out = {}
    for batch in batches:
        for int8 in ((False,) if train else (False, True)):
            key = (f"train_b{batch}" if train
                   else f"b{batch}" + ("_int8" if int8 else "_fp"))
            r = run_point(batch, int8, train=train, cfg=cfg)
            if r is not None:
                out[key] = {"fps": r["value"], "spread_pct": r.get("spread_pct"),
                            "mfu": r.get("mfu")}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
