"""Measure int8 (PTQ) vs bf16 serving on the real chip.

Stages: the raw conv microbench that motivated the feature (s8 vs bf16 on
an SSD conv shape), then the full fused predict (ObjectDetector) at
batch 1 and batch 8, fp vs int8-quantized.

Usage: python tools/int8_bench.py [--size 300] [--iters 200]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _bench_predict(det, batch, iters):
    import jax
    import jax.numpy as jnp

    h, w = det.img_hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8))
    jax.block_until_ready(det._predict(det.variables, img))
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = det._predict(det.variables, img)
        jax.block_until_ready(out)
        reps.append(batch * iters / (time.perf_counter() - t0))
    return float(np.median(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=300)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # raw conv microbench, conv4-ish SSD shape
    B, H, W, C, O = 8, 38, 38, 512, 512
    x8 = jnp.ones((B, H, W, C), jnp.int8)
    w8 = jnp.ones((3, 3, C, O), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    def conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    for name, (x, w, acc) in {
        "bf16": (xb, wb, jnp.float32), "int8": (x8, w8, jnp.int32)}.items():
        f = jax.jit(lambda x, w, acc=acc: conv(x, w, acc))
        jax.block_until_ready(f(x, w))
        t0 = time.perf_counter()
        for _ in range(50):
            o = f(x, w)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 50
        print(f"conv {name}: {dt*1e3:.3f} ms  "
              f"{2*B*H*W*C*O*9/dt/1e12:.0f} T/s")

    from ssds_tpu.config import default_config

    cfg = default_config()
    cfg.MODEL.IMAGE_SIZE = [args.size, args.size]
    if args.size == 512:
        cfg.MODEL.FEATURE_LAYER = [
            [22, 34, "S", "S", "S", "S", "S"],
            [512, 1024, 512, 256, 256, 256, 256]]
        cfg.MODEL.ASPECT_RATIOS = [
            [2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]]

    from ssds_tpu.detector import ObjectDetector

    det = ObjectDetector(cfg)
    for b in (1, 8, 32):
        print(f"fp   batch-{b}: {_bench_predict(det, b, max(args.iters//b, 20)):8.1f} img/s")
    n = det.quantize_int8()
    print(f"quantized {n} kernels")
    for b in (1, 8, 32):
        print(f"int8 batch-{b}: {_bench_predict(det, b, max(args.iters//b, 20)):8.1f} img/s")


if __name__ == "__main__":
    main()
