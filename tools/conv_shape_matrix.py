#!/usr/bin/env python
"""Pinpoint the conv-cliff variable: H vs W vs C (3x3 SAME convs, bf16, b32)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30, warmup=5):
    def run(n):
        for _ in range(warmup):
            out = fn(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        best = min(best, (run(2 * iters) - run(iters)) / iters)
    return best * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    bs = 32
    cases = [
        # (H, W, Cin, Cout)
        (300, 300, 64, 64),    # conv1_2: the cliff
        (300, 150, 64, 64),    # narrow W
        (150, 300, 64, 64),    # short H
        (150, 150, 64, 64),
        (300, 256, 64, 64),    # W pow2
        (300, 128, 64, 64),
        (300, 300, 128, 128),  # fat C at 300^2
        (150, 150, 128, 128),  # the known-fast shape
        (300, 300, 32, 32),
        (300, 300, 64, 128),
        (300, 300, 128, 64),
        (75, 300, 256, 256),
        (38, 300, 512, 512),
    ]
    for h, wd, ci, co in cases:
        x = jnp.asarray(rng.normal(0, 1, (bs, h, wd, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)), jnp.bfloat16)
        f = jax.jit(conv)
        t = timeit(f, x, w)
        fl = 2 * bs * h * wd * 9 * ci * co
        print(f"H{h:3d} W{wd:3d} C{ci:3d}->{co:3d}  fwd {t:7.2f} ms  "
              f"({fl / t / 1e9:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
