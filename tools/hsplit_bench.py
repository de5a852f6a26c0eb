#!/usr/bin/env python
"""Does H-splitting (row chunks + 1-row halo, no transposes) fix the
300^2 conv cliff in plain XLA?  conv1_2 shapes: [32,300,300,64] k3 SAME.

Also measures rectangle convs [rows x 300] to find where the cliff starts.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=8):
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


def conv(x, w, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.jit, static_argnames=("chunks",))
def hsplit_conv(x, w, chunks=2):
    b, h, width, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    step = h // chunks
    outs = [
        conv(jax.lax.slice_in_dim(xp, c * step, c * step + step + 2, axis=1),
             w, [(0, 0), (1, 1)])
        for c in range(chunks)
    ]
    return jnp.concatenate(outs, axis=1)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), jnp.bfloat16)

    f = jax.jit(lambda x, w: conv(x, w))
    ref = f(x, w)
    t0 = timeit(f, x, w)
    flops = 2 * bs * 300 * 300 * 9 * 64 * 64
    print(f"full 300x300    fwd {t0:7.2f} ms  "
          f"({flops / t0 / 1e9:5.1f} TF/s)", flush=True)

    # rectangles: where does the cliff start?
    for rows in (16, 32, 64, 75, 100, 150):
        xr = x[:, :rows]
        fr = jax.jit(lambda x, w: conv(x, w))
        t = timeit(fr, xr, w)
        fl = 2 * bs * rows * 300 * 9 * 64 * 64
        print(f"rect {rows:3d}x300    fwd {t:7.2f} ms  "
              f"({fl / t / 1e9:5.1f} TF/s)", flush=True)

    # H-split with halo
    for chunks in (2, 3, 4, 6, 10):
        fs = functools.partial(hsplit_conv, chunks=chunks)
        out = fs(x, w)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        t = timeit(fs, x, w)
        print(f"hsplit x{chunks:2d}      fwd {t:7.2f} ms  "
              f"({flops / t / 1e9:5.1f} TF/s)  maxerr {err:.4f}", flush=True)

    # f+b for the best splits vs baseline
    for name, fn in (("full", lambda x, w: conv(x, w)),
                     ("hsplit x2", functools.partial(hsplit_conv, chunks=2)),
                     ("hsplit x4", functools.partial(hsplit_conv, chunks=4))):
        g = jax.jit(jax.grad(
            lambda x, w: (fn(x, w).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1)))
        gg = lambda *a: g(*a)[0]
        t = timeit(jax.jit(gg), x, w)
        print(f"{name:14s} f+b {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
