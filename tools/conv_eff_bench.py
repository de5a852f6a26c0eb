#!/usr/bin/env python
"""XLA conv efficiency across the VGG/SSD shape spectrum (v5e, bf16).

For each (H, Cin, Cout) the same-FLOPs 3x3 conv is timed fwd and fwd+bwd
(pipelined dispatch, device_get sync, 2N-N differencing) and reported as
achieved TFLOP/s and % of the 197 TFLOP/s bf16 peak. Decides where the
train-step MFU attack should aim (early spatial-heavy layers vs deep
channel-heavy layers).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16


def timeit(fn, *args, iters=30):
    def run(n):
        out = None
        for _ in range(3):
            out = fn(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    return min((run(2 * iters) - run(iters)) / iters for _ in range(3))


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    shapes = [
        (300, 3, 64),     # conv1_1
        (300, 64, 64),    # conv1_2
        (150, 64, 128),   # conv2_1
        (150, 128, 128),  # conv2_2
        (75, 128, 256),   # conv3_x
        (75, 256, 256),
        (38, 256, 512),   # conv4_x
        (38, 512, 512),
        (19, 512, 512),   # conv5_x / fc-ish
        (19, 512, 1024),
    ]
    print(f"batch={bs}  (fwd%, f+b% of {PEAK/1e12:.0f} TFLOP/s peak)")
    for h, cin, cout in shapes:
        x = jnp.asarray(rng.normal(0, 1, (bs, h, h, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.bfloat16)
        f = jax.jit(lambda x, w: conv(x, w))
        g = jax.jit(jax.grad(
            lambda x, w: (conv(x, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        gflop = 2 * 9 * cin * cout * h * h * bs / 1e9
        t_f = timeit(f, x, w)
        def g2(x, w):
            a, b = g(x, w)
            return a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
        t_b = timeit(jax.jit(g2), x, w)
        eff_f = gflop / 1e3 / t_f / (PEAK / 1e12)
        eff_b = 3 * gflop / 1e3 / t_b / (PEAK / 1e12)
        print(f"  {h:3d}^2 {cin:4d}->{cout:4d}: fwd {t_f*1e3:6.2f} ms ({eff_f*100:4.1f}%)"
              f"   f+b {t_b*1e3:6.2f} ms ({eff_b*100:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
