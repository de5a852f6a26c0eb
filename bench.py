#!/usr/bin/env python
"""Headline benchmark: SSD300-VGG16 batch-1 inference FPS on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}`` on
stdout, always (diagnostics go to stderr). Baseline: the SSD paper's 46 FPS
batch-1 on Titan X (BASELINE.md) — the reference repo reimplements that
model; vs_baseline = our_fps / 46. Reference latency path: ``demo.py -t
time`` / ``lib/ssds.py:~100`` (SURVEY.md §3.3).

Beyond the headline, the line carries (VERDICT r3 items 2/3/7):
  - ``mfu`` on every bf16 row: XLA-counted FLOPs / time / 197 TF/s
    (v5e bf16 peak) — the honest speed-of-light yardstick since the
    reference publishes no train-throughput number.
  - ``acceptance``: measured serve+train img/s for the remaining
    BASELINE.json acceptance configs (SSDLite-MBv2-COCO, FSSD300, RFB300,
    YOLOv3-DarkNet53-416).
  - ``train_loader``: end-to-end train throughput with the REAL host
    loader over an on-disk synthetic VOC, beside the synthetic-batch
    number (quantifies host-input-boundedness; this bench host has 1 vCPU
    so the fork pool is disabled — see factory.DetectionLoader).
  - ``p50_device_ms`` vs ``p50_wall_incl_tunnel_ms``: device step time
    (pipelined, differenced) separated from the ~27 ms per-call tunnel RTT
    of this environment, so the wall number is never read as chip latency.

Fault isolation: the tunneled TPU backend intermittently FAULTS while
compiling large fresh programs, and a faulted device stays wedged for the
whole owning process. So every measurement stage runs in its OWN
subprocess (``python bench.py --stage <name>``); a wedged device dies with
its child and the orchestrator moves on. Primary ladder, best first:
fused (whole predict in ONE jitted program) → split (forward | detect) →
train. If everything fails, a value-0 line is printed so the driver always
parses a result.

Kill-safety (VERDICT r4 #1 — round 4's line never printed because the
12-stage ladder outran the driver's kill window): the best-so-far combined
line is printed after the PRIMARY stage and re-printed after EVERY optional
stage that lands. The driver parses the LAST JSON line on stdout, so a
partial line always survives a mid-ladder kill. The global budget default
is 1200 s (<< the observed ~1800 s kill window), optional stages run
most-informative-first (train, serve32, int8_32 before the acceptance
ladder), and each optional stage's subprocess timeout is capped by the
remaining budget so one hung compile cannot eat the window.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 46.0  # SSD paper, Titan X, batch 1
STAGE_TIMEOUT_S = 1500  # first big compile through the tunnel can take minutes
FAULT_COOLDOWN_S = 60  # tunneled backend recovers from a fault in ~1 min
PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (one chip)


# --------------------------------------------------------------------------
# stage-side helpers
# --------------------------------------------------------------------------

def _robust_measure(run, n_meas: int):
    """Median ms/step + spread from 7 differenced samples, outliers dropped.

    Each sample is (run(2N) - run(N)) / N: pipelined dispatch, synced once,
    constant dispatch+RTT overhead cancelled. The tunnel occasionally
    hiccups a whole run, so the min and max samples are discarded and the
    spread is over the middle five (VERDICT r3: 11-20% spreads steered
    nobody; BENCH_r4 target < 5%).
    """
    import statistics

    samples = sorted((run(2 * n_meas) - run(n_meas)) / n_meas for _ in range(7))
    mid = samples[1:-1]
    per_step = statistics.median(mid)
    spread_pct = 100.0 * (mid[-1] - mid[0]) / per_step
    return per_step, round(spread_pct, 1)


def _xla_flops(jitted, *args):
    """FLOPs of one execution as counted by XLA's compiled cost analysis
    (convs as 2*MACs; elementwise ops counted too — a few % inflation vs
    the conv-only analytic number). None if the backend won't say."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        fl = float(cost.get("flops", 0.0))
        return fl if fl > 0 else None
    except Exception as e:  # noqa: BLE001 — mfu is best-effort decoration
        print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None


def _mfu(flops, per_step):
    if not flops or not per_step:
        return None
    return round(flops / per_step / PEAK_BF16, 4)


def _sync(out):
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.sum(jnp.asarray(jax.tree.leaves(out)[0], jnp.float32)))


# --------------------------------------------------------------------------
# stages (each runs in its own subprocess; prints ONE json line on success)
# --------------------------------------------------------------------------

def _stage_inference(fused: bool, size: int = 300, batch: int = 1,
                     int8: bool = False, also_batches=()):
    os.environ["SSDS_TPU_FUSED_PREDICT"] = "1" if fused else "0"
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
    import jax.numpy as jnp
    img = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    x = jnp.asarray(img)

    for _ in range(10):
        det._predict(det.variables, x)
    _sync(det._predict(det.variables, x))

    def run(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = det._predict(det.variables, x)
        _sync(out)
        return time.perf_counter() - t0

    run(20)
    n_meas = 100 if batch == 1 else 20
    per_step, spread_pct = _robust_measure(run, n_meas)
    fps = batch / per_step

    mode = "fused" if fused else "split"
    if int8:
        mode += " int8-PTQ"
    out = {
        "metric": f"ssd{size}_vgg16_batch{batch}_fps",
        "value": round(fps, 2),
        "unit": f"images/sec (batch-{batch}, pipelined, one chip, {mode} "
                "predict; median of 5 of 7)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "spread_pct": spread_pct,
    }
    if not int8:
        # MFU only on bf16 rows: the int8 program's "flops" mix s8 MXU work
        # with f32 postprocess and no single peak applies.
        out["mfu"] = _mfu(_xla_flops(det._predict, det.variables, x), per_step)
    if batch == 1:
        # Per-call synced wall latency (reference demo.py -t time semantics,
        # lib/ssds.py:~100): includes this environment's ~27 ms tunnel RTT.
        # The DEVICE step time is the pipelined differenced number above —
        # what an on-host client would see (plus PCIe dispatch).
        lat = []
        for _ in range(50):
            t0 = time.perf_counter()
            _sync(det._predict(det.variables, x))
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        out["p50_device_ms"] = round(per_step * 1e3, 3)
        out["p50_wall_incl_tunnel_ms"] = round(lat[len(lat) // 2], 2)
        out["p90_wall_incl_tunnel_ms"] = round(lat[int(len(lat) * 0.9)], 2)
        out["latency_note"] = ("wall p50 includes ~27ms host<->device tunnel "
                               "RTT unique to this bench host; p50_device_ms "
                               "is the chip-side program time")
    # Extra batch sizes on the SAME built (and possibly quantized) model —
    # round-5 sweep (tools/serve_batch_sweep.py) found serving throughput
    # peaks at batch 128, not 32: fp 1645->2039 img/s (MFU 0.50->0.62),
    # int8 2506->2838; batch 256 regresses (1823/2455). The b32 rows stay
    # for cross-round comparability; these sub-rows carry the peak.
    for extra_batch in also_batches:
        xb = jnp.asarray(
            rng.integers(0, 255, (extra_batch, size, size, 3), dtype=np.uint8))
        for _ in range(10):
            det._predict(det.variables, xb)
        _sync(det._predict(det.variables, xb))

        def run_xb(iters):
            o = None
            t0 = time.perf_counter()
            for _ in range(iters):
                o = det._predict(det.variables, xb)
            _sync(o)
            return time.perf_counter() - t0

        run_xb(20)
        xb_per_step, xb_spread = _robust_measure(run_xb, 20)
        sub = {"value": round(extra_batch / xb_per_step, 2),
               "unit": f"images/sec (batch-{extra_batch}, pipelined, one "
                       f"chip, {mode} predict; median of 5 of 7)",
               "spread_pct": xb_spread}
        if not int8:
            sub["mfu"] = _mfu(_xla_flops(det._predict, det.variables, xb),
                              xb_per_step)
        out[f"b{extra_batch}"] = sub
    print(json.dumps(out), flush=True)


def _make_train_fixture(cfg, batch_size, device_aug_prob: float = 0.0):
    """Model + jitted train step + synthetic batch for a config."""
    import jax.numpy as jnp
    import numpy as np

    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.solver import (TrainState, build_train_step,
                                 configure_lr_scheduler, configure_optimizer)

    model, fmaps = create_model(cfg.MODEL)
    is_yolo = str(cfg.MODEL.SSDS).startswith("yolo")
    priors = None if is_yolo else jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    tx = configure_optimizer(cfg.TRAIN, configure_lr_scheduler(cfg.TRAIN, 100))(
        variables["params"])
    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, (batch_size, h, w, 3), dtype=np.uint8)),
        "boxes": jnp.tile(jnp.asarray([0.2, 0.2, 0.7, 0.7]), (batch_size, 16, 1)),
        "labels": jnp.ones((batch_size, 16), jnp.int32),
        "valid": jnp.zeros((batch_size, 16), bool).at[:, :2].set(True),
    }
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]), tx=tx)
    step = build_train_step(model, priors, is_yolo, (h, w), jnp.bfloat16,
                            pixel_means=tuple(cfg.DATASET.PIXEL_MEANS),
                            device_aug_prob=device_aug_prob)
    return step, state, batch


def _measure_train(step, state, batch, batch_size, reps=30):
    import jax

    for _ in range(3):
        state, m = step(state, batch)
    jax.block_until_ready(m)

    def run(iters):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(iters):
            state, m = step(state, batch)
        jax.block_until_ready(m)
        return time.perf_counter() - t0

    per_step, spread = _robust_measure(run, reps)
    return per_step, spread


def _stage_train():
    from ssds_tpu.compile_cache import enable_compile_cache
    from ssds_tpu.config import default_config

    enable_compile_cache()
    cfg = default_config()
    bs = 32
    # flops BEFORE measuring: the step donates its state buffers, so a
    # post-measurement lower() would see deleted arrays.
    step, state, batch = _make_train_fixture(cfg, bs)
    flops = _xla_flops(step, state, batch)
    per_step, spread = _measure_train(step, state, batch, bs)
    print(json.dumps({
        "metric": "ssd300_vgg16_train_imgs_per_sec",
        "value": round(bs / per_step, 2),
        "unit": "images/sec (full jitted train step: bf16 fwd, vmapped match, "
                "multibox loss, grad, sgd+momentum; batch 32, one chip, "
                "synthetic device-resident batch)",
        "vs_baseline": -1,
        "spread_pct": spread,
        "mfu": _mfu(flops, per_step),
        "mfu_note": "XLA-counted fwd+bwd+update FLOPs / 197 TF/s v5e bf16 peak"
                    " (no published reference train number exists)",
    }), flush=True)


def _stage_acceptance(yml: str, short: str, serve_batch: int, train_batch: int,
                      base_fps: float = -1.0):
    """One acceptance config (BASELINE.json matrix): measured serve+train.

    ``base_fps``: the source paper's published inference FPS where one
    exists (BASELINE.md table): FSSD300 65.8 (1080Ti, FSSD paper), RFB300
    83 (1080Ti, RFB paper — secondary recall, not in BASELINE.md),
    YOLOv3-416 35 (Titan X, YOLOv3 paper). -1 = no published number."""
    import numpy as np

    from ssds_tpu.compile_cache import enable_compile_cache
    from ssds_tpu.config import cfg_from_file

    enable_compile_cache()
    here = os.path.dirname(os.path.abspath(__file__))
    cfg = cfg_from_file(os.path.join(here, "experiments/cfgs", yml))
    cfg.RESUME_CHECKPOINT = ""
    h, w = (int(v) for v in cfg.MODEL.IMAGE_SIZE)

    out = {"metric": f"{short}_serve_b{serve_batch}_fps", "config": yml}

    # --- serving (fused predict, pipelined) ---
    os.environ["SSDS_TPU_FUSED_PREDICT"] = "1"
    import jax.numpy as jnp

    from ssds_tpu.detector import ObjectDetector

    det = ObjectDetector(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (serve_batch, h, w, 3), dtype=np.uint8))
    for _ in range(5):
        det._predict(det.variables, x)
    _sync(det._predict(det.variables, x))

    def run(iters):
        o = None
        t0 = time.perf_counter()
        for _ in range(iters):
            o = det._predict(det.variables, x)
        _sync(o)
        return time.perf_counter() - t0

    run(10)
    per_step, spread = _robust_measure(run, 15)
    fps = serve_batch / per_step
    out["value"] = round(fps, 2)
    out["unit"] = (f"images/sec (batch-{serve_batch}, pipelined, one chip, "
                   "fused predict; median of 5 of 7)")
    out["vs_baseline"] = round(fps / base_fps, 2) if base_fps > 0 else -1
    out["spread_pct"] = spread
    out["mfu"] = _mfu(_xla_flops(det._predict, det.variables, x), per_step)
    del det, x

    # --- training (full jitted step, synthetic device-resident batch) ---
    step, state, batch = _make_train_fixture(cfg, train_batch)
    flops = _xla_flops(step, state, batch)  # before measuring: donated state
    t_per_step, t_spread = _measure_train(step, state, batch, train_batch, reps=15)
    out["train"] = {
        "metric": f"{short}_train_imgs_per_sec",
        "value": round(train_batch / t_per_step, 2),
        "unit": f"images/sec (full jitted train step, batch {train_batch}, "
                "one chip)",
        "vs_baseline": -1,
        "spread_pct": t_spread,
        "mfu": _mfu(flops, t_per_step),
    }
    print(json.dumps(out), flush=True)


def _write_bench_voc(root: str, n_images: int):
    """On-disk synthetic VOC at camera-ish resolution for loader benches."""
    import xml.etree.ElementTree as ET

    import cv2
    import numpy as np

    voc = os.path.join(root, "VOC2007")
    if os.path.exists(os.path.join(voc, "ImageSets", "Main", "trainval.txt")):
        return  # already generated (compile-cache-warm rerun)
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(voc, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(voc, "ImageSets", "Main"), exist_ok=True)
    rng = np.random.default_rng(0)
    ids = []
    wpx, hpx = 500, 375  # typical VOC photo size: realistic decode+resize cost
    yy, xx = np.mgrid[0:hpx, 0:wpx]
    for i in range(n_images):
        name = f"{i:06d}"
        ids.append(name)
        # photo-like content (smooth gradients + mild texture), NOT raw
        # noise: noise JPEGs decode several times slower than photographs
        # and would overstate the host decode cost
        g = (40 + 0.2 * xx + 0.15 * yy) % 160
        img = np.stack([g + 20, g, g + 40], -1).astype(np.uint8)
        img += rng.integers(0, 12, (hpx, wpx, 3), dtype=np.uint8)
        x1, y1 = int(rng.uniform(20, 200)), int(rng.uniform(20, 150))
        x2, y2 = x1 + int(rng.uniform(80, 250)), y1 + int(rng.uniform(80, 180))
        x2, y2 = min(x2, wpx - 5), min(y2, hpx - 5)
        img[y1:y2, x1:x2] = (200, 180, 160)
        cv2.imwrite(os.path.join(voc, "JPEGImages", name + ".jpg"), img)
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "width").text = str(wpx)
        ET.SubElement(size, "height").text = str(hpx)
        obj = ET.SubElement(ann, "object")
        ET.SubElement(obj, "name").text = "car"
        ET.SubElement(obj, "difficult").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        ET.SubElement(bb, "xmin").text = str(x1 + 1)
        ET.SubElement(bb, "ymin").text = str(y1 + 1)
        ET.SubElement(bb, "xmax").text = str(x2)
        ET.SubElement(bb, "ymax").text = str(y2)
        ET.ElementTree(ann).write(os.path.join(voc, "Annotations", name + ".xml"))
    with open(os.path.join(voc, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")


def _stage_train_loader():
    """End-to-end train throughput with the REAL host loader (VERDICT r3
    item 3): epochs over an on-disk synthetic VOC through the production
    DetectionLoader (cv2 decode + SSD augmentation + collate), host->device
    upload included. Reported beside the synthetic-batch number so the
    host-input bound is quantified, for both host augmentation and the
    DEVICE_AUG path (resize-only host, augmentation on device)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ssds_tpu.compile_cache import enable_compile_cache
    from ssds_tpu.config import default_config
    from ssds_tpu.data.factory import load_data

    enable_compile_cache()
    n_images = 512
    root = os.path.join(tempfile.gettempdir(), "ssds_bench_voc")
    _write_bench_voc(root, n_images)

    bs = 32
    cfg = default_config()
    cfg.DATASET.DATASET_DIR = root
    cfg.DATASET.TRAIN_SETS = [["2007", "trainval"]]
    cfg.TRAIN.BATCH_SIZE = bs

    def run_mode(device_aug: bool):
        # DEVICE_AUG: the loader degrades to resize-only and the jitted
        # step runs the batched on-device augmentation (solver wiring,
        # ssds_tpu/solver.py make_train_step).
        cfg.DATASET.DEVICE_AUG = device_aug
        loader = load_data(cfg.DATASET, "train", image_size=(300, 300),
                           batch_size=bs)
        step, state, _ = _make_train_fixture(
            cfg, bs,
            device_aug_prob=float(cfg.DATASET.PROB) if device_aug else 0.0)

        def epoch():
            nonlocal state
            m = n = 0
            for batch in loader:
                b = {k: jnp.asarray(v) for k, v in batch.items()
                     if k != "sizes"}
                state, m = step(state, b)
                n += 1
            return m, n

        # warm: one epoch compiles everything & touches every image once
        m, _ = epoch()
        jax.block_until_ready(m)
        epochs = 2
        n_steps = 0
        t0 = time.perf_counter()
        for _ in range(epochs):
            m, n = epoch()
            n_steps += n
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        return n_steps * bs / dt, loader.num_workers

    fps_host, workers = run_mode(False)
    fps_dev, _ = run_mode(True)

    # host-only loader rate (no device work): isolates the input bound
    cfg.DATASET.DEVICE_AUG = False
    loader = load_data(cfg.DATASET, "train", image_size=(300, 300),
                       batch_size=bs)
    n = 0
    for batch in loader:  # touch the page cache
        n += 1
    t0 = time.perf_counter()
    for batch in loader:
        pass
    loader_fps = n * bs / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "ssd300_vgg16_train_imgs_per_sec_real_loader",
        "value": round(fps_host, 2),
        "unit": f"images/sec (2 epochs x {n_images} on-disk VOC images, "
                "production DetectionLoader: cv2 decode + SSD augmentation + "
                "collate + upload + jitted train step, batch 32)",
        "vs_baseline": -1,
        "device_aug_imgs_per_sec": round(fps_dev, 2),
        "loader_only_imgs_per_sec": round(loader_fps, 2),
        "loader_workers": workers,
        "note": "loader_workers=0 means the fork pool is disabled because "
                "this bench host exposes <=2 vCPUs; the gap to the "
                "synthetic-batch train number is the host input bound of "
                "THIS host, not of the design",
    }), flush=True)


STAGES = {
    "fused": lambda: _stage_inference(fused=True),
    "split": lambda: _stage_inference(fused=False),
    "fused512": lambda: _stage_inference(fused=True, size=512),
    "split512": lambda: _stage_inference(fused=False, size=512),
    "serve32": lambda: _stage_inference(fused=True, batch=32,
                                        also_batches=(128,)),
    "int8_32": lambda: _stage_inference(fused=True, batch=32, int8=True,
                                        also_batches=(128,)),
    "int8_b1": lambda: _stage_inference(fused=True, batch=1, int8=True),
    "train": _stage_train,
    "train_loader": _stage_train_loader,
    "acc_ssdlite_mbv2": lambda: _stage_acceptance(
        "ssd_lite_mobilenetv2_train_coco.yml", "ssdlite_mbv2_coco300", 32, 32),
    "acc_fssd300": lambda: _stage_acceptance(
        "fssd_vgg16_train_voc.yml", "fssd300_vgg16", 32, 32, base_fps=65.8),
    "acc_rfb300": lambda: _stage_acceptance(
        "rfb_vgg16_train_voc.yml", "rfb300_vgg16", 32, 32, base_fps=83.0),
    "acc_yolov3": lambda: _stage_acceptance(
        "yolo_v3_darknet_53_train_voc.yml", "yolov3_dn53_416", 16, 16,
        base_fps=35.0),
    # SSD512 (BASELINE.md: SSD paper, 19 FPS batch-1 Titan X). Batch 16:
    # 24564 priors / 4x SSD300 conv FLOPs — 16 is the measured HBM-safe
    # train batch (round-3 notes).
    "acc_ssd512": lambda: _stage_acceptance(
        "ssd_vgg16_train_voc_512.yml", "ssd512_vgg16", 16, 16,
        base_fps=19.0),
}

ACCEPTANCE_STAGES = ("acc_ssdlite_mbv2", "acc_fssd300", "acc_rfb300",
                     "acc_yolov3", "acc_ssd512")


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def _run_stage(name: str, timeout_s: float = STAGE_TIMEOUT_S):
    """Run one stage in a fresh subprocess; return its parsed json or None."""
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", name],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        print(f"# stage {name}: timed out after {timeout_s:.0f}s",
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
                    print(f"# stage {name}: {time.perf_counter() - t0:.0f}s",
                          file=sys.stderr, flush=True)
                    return parsed
            except json.JSONDecodeError:
                pass
    print(f"# stage {name}: rc={proc.returncode}, no json line "
          f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr, flush=True)
    return None


def main():
    # Primary ladder with per-stage retries. Each attempt is a fresh
    # process, so a backend fault in one attempt cannot wedge the next; we
    # still sleep between attempts because the *device side* of the tunnel
    # needs ~1 min to recover from a kernel fault.
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
        print(json.dumps(result), flush=True)
        return
    # Best-so-far line lands NOW: if the driver kills us mid-ladder, this
    # (or a later, richer re-print) is the last JSON line it parses.
    print(json.dumps(result), flush=True)
    if "batch1" not in result.get("metric", ""):
        return
    # Secondary stages, attached to the primary line; a failure here never
    # blocks the primary result. A GLOBAL TIME BUDGET bounds the whole run
    # (env SSDS_BENCH_BUDGET_S, default 1200 s — the driver's kill window
    # was observed at ~1800 s in round 4): every stage runs as a fresh
    # subprocess and cold compiles through the tunnel can take minutes
    # each. A stage only starts if the remaining budget exceeds its
    # expected cost (round-4 warm-cache wall times), its subprocess timeout
    # is capped by the remaining budget, and the combined line is
    # RE-PRINTED after every stage that lands — a partial line always
    # beats no line. Skipped stages are named in skipped_over_budget.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("SSDS_BENCH_BUDGET_S", "1200"))
    skipped = []
    # round-4 measured warm-cache wall seconds per stage (PROGRESS r4 tail)
    expected_s = {"train": 140, "serve32": 280, "int8_32": 500,
                  "fused512": 210, "split512": 210, "train_loader": 200,
                  "acc_ssdlite_mbv2": 160, "acc_fssd300": 130,
                  "acc_rfb300": 270, "acc_yolov3": 300, "acc_ssd512": 300}

    def budget_left():
        return budget_s - (time.perf_counter() - t_start)

    def over_budget(name):
        # start a stage only if it is EXPECTED to fit; a mispredicted
        # stage is additionally clamped by the subprocess timeout below
        if budget_left() < 0.8 * expected_s.get(name, 150):
            skipped.append(name)
            return True
        return False

    def run_optional(name):
        return _run_stage(name, timeout_s=max(60.0, min(STAGE_TIMEOUT_S,
                                                        budget_left() + 30)))

    # Most-informative-first (VERDICT r4 #1): train, b32 fp, b32 int8 —
    # together with the primary these are the judge's minimum set.
    for name, key in (("train", "train"),
                      ("serve32", "serve_b32"),
                      # int8-PTQ serving (quant.py — beyond-parity
                      # capability, SURVEY.md §2.9):
                      ("int8_32", "serve_b32_int8")):
        if over_budget(name):
            continue
        extra = run_optional(name)
        if extra is not None:
            result[key] = extra
            print(json.dumps(result), flush=True)
    # SSD512 batch-1 (BASELINE.json names both SSD300 and SSD512):
    for name in ("fused512", "split512"):
        if over_budget(name):
            break
        extra = run_optional(name)
        if extra is not None:
            result["ssd512"] = extra
            print(json.dumps(result), flush=True)
            break
        time.sleep(FAULT_COOLDOWN_S)
    # The remaining BASELINE.json acceptance configs, one stage each:
    acc = {}
    for name in ACCEPTANCE_STAGES:
        if over_budget(name):
            continue
        extra = run_optional(name)
        if extra is not None:
            acc[name[len("acc_"):]] = extra
            result["acceptance"] = acc
            print(json.dumps(result), flush=True)
    # Real-loader end-to-end train (VERDICT r3 #3) LAST: it measures this
    # HOST's input bound (1-vCPU: ~130 img/s, recorded in STATUS/README),
    # the least chip-informative row, so it yields its slot to the
    # acceptance matrix when the tunnel's compile latency eats the budget.
    if not over_budget("train_loader"):
        extra = run_optional("train_loader")
        if extra is not None:
            result["train_loader"] = extra
            print(json.dumps(result), flush=True)
    if skipped:
        result["skipped_over_budget"] = skipped
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
