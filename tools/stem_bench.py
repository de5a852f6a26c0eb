#!/usr/bin/env python
"""Microbenchmark: VGG stem variants on the TPU (decides the MFU attack).

Variants, all computing EXACTLY the same math as conv1_1 (k3 s1, 3->64 at
300^2) unless noted:

  conv1_1          — baseline: 3 input channels waste 125/128 MXU lanes
  conv1_1_s2d2     — space-to-depth block 2: k3 conv 12->256 on 150^2 whose
                     zero-filled kernel reproduces conv1_1 exactly
  conv1_1_s2d4     — block 4: k2 conv 48->1024 on 75^2
  pool_rw          — 2x2 s2 max pool via reduce_window (current MaxPool)
  pool_slices      — same pool via jnp.maximum of 4 strided slices

Each is timed forward and forward+backward (sum-of-squares loss), batch 32,
bf16, pipelined dispatch. Prints a table; run on the real chip.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=8):
    # The tunneled backend's block_until_ready can return before execution
    # finishes, so sync with a device_get of a reduction over the output.
    # Constant per-run overhead (dispatch + ~30 ms tunnel RTT) is cancelled
    # by differencing a 2N-iteration run against an N-iteration run.
    def run(n):
        for _ in range(warmup):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_map(
            lambda t: jnp.sum(t.astype(jnp.float32)), out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_map(
            lambda t: jnp.sum(t.astype(jnp.float32)), out))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        best = min(best, (run(2 * iters) - run(iters)) / iters)
    return best * 1e3  # ms


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d(x, b):
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // b, W // b, b * b * C)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)

    # --- baseline conv1_1
    f = jax.jit(lambda x, w: conv(x, w))
    g = jax.jit(jax.grad(lambda x, w: (conv(x, w).astype(jnp.float32) ** 2).sum(),
                         argnums=(0, 1)))
    print(f"conv1_1        fwd {timeit(f, x, w):7.2f} ms   "
          f"f+b {timeit(g, x, w):7.2f} ms", flush=True)

    # --- s2d variants (timing-only here: random dense kernels of the
    # equivalent shapes; the exact zero-filled weight transform lives in the
    # real implementation if these numbers justify it)
    for b, k in ((2, 3), (4, 2)):
        xs = s2d(x, b)
        wsj = jnp.asarray(
            rng.normal(0, 0.1, (k, k, 3 * b * b, 64 * b * b)), jnp.bfloat16)
        f2 = jax.jit(lambda x, w: conv(x, w))
        g2 = jax.jit(jax.grad(
            lambda x, w: (conv(x, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
        print(f"conv1_1_s2d{b}   fwd {timeit(f2, xs, wsj):7.2f} ms   "
              f"f+b {timeit(g2, xs, wsj):7.2f} ms", flush=True)

    # --- conv1_2 (64->64 at 300^2): the other stem cost, for context
    x12 = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 64)), jnp.bfloat16)
    w12 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)
    f12 = jax.jit(lambda x, w: conv(x, w))
    g12 = jax.jit(jax.grad(
        lambda x, w: (conv(x, w).astype(jnp.float32) ** 2).sum(), argnums=(0, 1)))
    print(f"conv1_2        fwd {timeit(f12, x12, w12):7.2f} ms   "
          f"f+b {timeit(g12, x12, w12):7.2f} ms", flush=True)

    # --- pooling variants on [32, 300, 300, 64]
    y = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 64)), jnp.bfloat16)

    def pool_rw(t):
        return jax.lax.reduce_window(t, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def pool_slices(t):
        a = jnp.maximum(t[:, ::2, ::2], t[:, 1::2, ::2])
        b_ = jnp.maximum(t[:, ::2, 1::2], t[:, 1::2, 1::2])
        return jnp.maximum(a, b_)

    def pool_reshape(t):
        # stride==kernel pooling as reshape+max: backward is a compare-mask
        # broadcast instead of select_and_scatter
        B, H, W, C = t.shape
        return t.reshape(B, H // 2, 2, W // 2, 2, C).max(axis=(2, 4))

    for name, p in (("pool_rw", pool_rw), ("pool_slices", pool_slices),
                    ("pool_reshape", pool_reshape)):
        f3 = jax.jit(p)
        g3 = jax.jit(jax.grad(lambda t: (p(t).astype(jnp.float32) ** 2).sum()))
        print(f"{name:14s} fwd {timeit(f3, y):7.2f} ms   "
              f"f+b {timeit(g3, y):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
