#!/usr/bin/env python
"""Isolate the new tiled-stem pieces: why is the composed train step slower?

Times (batch 32, bf16, 300^2):
  plain stem  f/f+b : conv1_1+relu+conv1_2+relu+pool (reduce_window)
  tiled stem  f/f+b : s2d+k2conv+relu+k2conv+relu+groupmax
  k2 conv 256->256 alone on [32,151,151,256]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from ssds_tpu.models.layers import expand_s2d_kernel_k2, space_to_depth


def timeit(fn, *args, iters=30, warmup=5):
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
    return best * 1e3


def conv_p1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_valid(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def plain_stem(x, w1, w2):
    a1 = jax.nn.relu(conv_p1(x, w1))
    a2 = jax.nn.relu(conv_p1(a1, w2))
    return jax.lax.reduce_window(a2, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def tiled_stem(x, w1, w2):
    w1t = expand_s2d_kernel_k2(w1)
    w2t = expand_s2d_kernel_k2(w2)
    xs = jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = conv_valid(xs, w1t)
    n, hs, ws_, _ = y.shape
    y = y.reshape(n, hs, ws_, 4, 64)
    row = jnp.arange(hs)[:, None, None, None]
    col = jnp.arange(ws_)[None, :, None, None]
    g = jnp.arange(4)[None, None, :, None]
    gy, gx = g // 2, g % 2
    mask = ((row > 0) | (gy != 0)) & ((row < hs - 1) | (gy != 1)) & \
           ((col > 0) | (gx != 0)) & ((col < ws_ - 1) | (gx != 1))
    y = jnp.where(mask, y, 0).reshape(n, hs, ws_, 256)
    y = jax.nn.relu(y)
    y = jax.nn.relu(conv_valid(y, w2t))
    n, hs, ws_, _ = y.shape
    return y.reshape(n, hs, ws_, 4, 64).max(axis=3)


def main():
    bs = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)

    for name, fn in (("plain", plain_stem), ("tiled", tiled_stem)):
        f = jax.jit(fn)
        g = jax.jit(jax.grad(
            lambda x, w1, w2: (fn(x, w1, w2).astype(jnp.float32) ** 2).sum(),
            argnums=(1, 2)))
        # check equality once
        if name == "tiled":
            ref = jax.jit(plain_stem)(x, w1, w2)
            got = f(x, w1, w2)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            print(f"  maxerr vs plain: {err:.4f}", flush=True)
        print(f"{name} stem   fwd {timeit(f, x, w1, w2):7.2f} ms   "
              f"f+b {timeit(g, x, w1, w2):7.2f} ms", flush=True)

    # k2 conv alone (the supposed-fast piece)
    xs = jnp.asarray(rng.normal(0, 1, (bs, 151, 151, 256)), jnp.bfloat16)
    w2t = jnp.asarray(rng.normal(0, 0.05, (2, 2, 256, 256)), jnp.bfloat16)
    f = jax.jit(conv_valid)
    g = jax.jit(jax.grad(
        lambda x, w: (conv_valid(x, w).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1)))
    fl = 2 * bs * 150 * 150 * 4 * 256 * 256
    t = timeit(f, xs, w2t)
    print(f"k2 256x256     fwd {t:7.2f} ms ({fl / t / 1e9:6.1f} TF/s)   "
          f"f+b {timeit(g, xs, w2t):7.2f} ms", flush=True)

    # k3 SAME conv 256ch at 150^2 for comparison
    xs3 = jnp.asarray(rng.normal(0, 1, (bs, 150, 150, 256)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 256, 256)), jnp.bfloat16)
    f3 = jax.jit(conv_p1)
    fl3 = 2 * bs * 150 * 150 * 9 * 256 * 256
    t3 = timeit(f3, xs3, w3)
    print(f"k3 256x256     fwd {t3:7.2f} ms ({fl3 / t3 / 1e9:6.1f} TF/s)",
          flush=True)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


# ---- variant analysis (run with arg "v2") -------------------------------

def tiled_conv1_im2col(x, w1t):
    # conv1_1 as im2col matmul: K = 2*2*12 = 48 contraction
    xs = jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    pats = jnp.concatenate(
        [xs[:, ky:ky + 151, kx:kx + 151, :] for ky in range(2) for kx in range(2)],
        axis=-1)  # [B,151,151,48]
    return jax.lax.dot_general(
        pats, w1t.reshape(48, 256),
        dimension_numbers=(((3,), (0,)), ((), ())))


def tiled_stem_v2(x, w1, w2, mode="im2col"):
    w1t = expand_s2d_kernel_k2(w1)
    w2t = expand_s2d_kernel_k2(w2)
    if mode == "im2col":
        y = tiled_conv1_im2col(x, w1t)
    else:  # cpad: zero-pad Cin 12->128
        xs = jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, 0), (0, 116)))
        w1p = jnp.pad(w1t, ((0, 0), (0, 0), (0, 116), (0, 0)))
        y = conv_valid(xs, w1p)
    n, hs, ws_, _ = y.shape
    y = y.reshape(n, hs, ws_, 4, 64)
    row = jnp.arange(hs)[:, None, None, None]
    col = jnp.arange(ws_)[None, :, None, None]
    g = jnp.arange(4)[None, None, :, None]
    gy, gx = g // 2, g % 2
    mask = ((row > 0) | (gy != 0)) & ((row < hs - 1) | (gy != 1)) & \
           ((col > 0) | (gx != 0)) & ((col < ws_ - 1) | (gx != 1))
    y = jnp.where(mask, y, 0).reshape(n, hs, ws_, 256)
    y = jax.nn.relu(y)
    y = jax.nn.relu(conv_valid(y, w2t))
    n, hs, ws_, _ = y.shape
    return y.reshape(n, hs, ws_, 4, 64).max(axis=3)


def main_v2():
    bs = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)
    ref = jax.jit(plain_stem)(x, w1, w2)

    # sub-chain: tiled conv1_1 alone (original k2 conv, Cin 12)
    w1t = expand_s2d_kernel_k2(w1)
    f0 = jax.jit(lambda x, w1t: conv_valid(
        jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0))), w1t))
    print(f"tiled conv1_1 k2(Cin12)  fwd {timeit(f0, x, w1t):7.2f} ms", flush=True)
    f1 = jax.jit(tiled_conv1_im2col)
    print(f"tiled conv1_1 im2col     fwd {timeit(f1, x, w1t):7.2f} ms", flush=True)

    for mode in ("im2col", "cpad"):
        fn = functools.partial(tiled_stem_v2, mode=mode)
        f = jax.jit(fn)
        got = f(x, w1, w2)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        g = jax.jit(jax.grad(
            lambda x, w1, w2: (fn(x, w1, w2).astype(jnp.float32) ** 2).sum(),
            argnums=(1, 2)))
        print(f"tiled_v2[{mode:6s}] fwd {timeit(f, x, w1, w2):7.2f} ms   "
              f"f+b {timeit(g, x, w1, w2):7.2f} ms   maxerr {err:.4f}",
              flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v2":
    main_v2()


# ---- v3: reshape-free mask and group-max (run with arg "v3") -------------

def mask256(y):
    # [B,hs,ws,256]: zero logical row/col -1 and H borders without reshape
    n, hs, ws_, _ = y.shape
    row = jnp.arange(hs)[:, None, None]
    col = jnp.arange(ws_)[None, :, None]
    g = jnp.repeat(jnp.arange(4), 64)[None, None, :]  # group id per channel
    gy, gx = g // 2, g % 2
    m = ((row > 0) | (gy != 0)) & ((row < hs - 1) | (gy != 1)) & \
        ((col > 0) | (gx != 0)) & ((col < ws_ - 1) | (gx != 1))
    return jnp.where(m[None], y, 0)


def groupmax256(y):
    return jnp.maximum(jnp.maximum(y[..., 0:64], y[..., 64:128]),
                       jnp.maximum(y[..., 128:192], y[..., 192:256]))


def tiled_stem_v3(x, w1, w2):
    w1t = expand_s2d_kernel_k2(w1)
    w2t = expand_s2d_kernel_k2(w2)
    xs = jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = mask256(conv_valid(xs, w1t))
    y = jax.nn.relu(y)
    y = jax.nn.relu(conv_valid(y, w2t))
    return groupmax256(y)


def main_v3():
    bs = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)
    ref = jax.jit(plain_stem)(x, w1, w2)

    f = jax.jit(tiled_stem_v3)
    got = f(x, w1, w2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    g = jax.jit(jax.grad(
        lambda x, w1, w2: (tiled_stem_v3(x, w1, w2).astype(jnp.float32) ** 2).sum(),
        argnums=(1, 2)))
    print(f"tiled_v3  fwd {timeit(f, x, w1, w2):7.2f} ms   "
          f"f+b {timeit(g, x, w1, w2):7.2f} ms   maxerr {err:.4f}", flush=True)

    # cumulative chains to locate composition loss
    w1t = expand_s2d_kernel_k2(w1)
    w2t = expand_s2d_kernel_k2(w2)
    chains = {
        "c1 conv1": lambda x: conv_valid(
            jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0))), w1t),
        "c2 +mask+relu": lambda x: jax.nn.relu(mask256(conv_valid(
            jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0))), w1t))),
        "c3 +conv2": lambda x: conv_valid(jax.nn.relu(mask256(conv_valid(
            jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0))), w1t))), w2t),
        "c4 +relu+gmax": lambda x: groupmax256(jax.nn.relu(
            conv_valid(jax.nn.relu(mask256(conv_valid(
                jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0))),
                w1t))), w2t))),
    }
    for name, fn in chains.items():
        print(f"{name:14s} fwd {timeit(jax.jit(fn), x):7.2f} ms", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v3":
    main_v3()


# ---- v4: two-stage aligned group-max (run with arg "v4") -----------------

def groupmax256_v4(y):
    z = jnp.maximum(y[..., 0:128], y[..., 128:256])  # lane-aligned halves
    return jnp.maximum(z[..., 0:64], z[..., 64:128])


def tiled_stem_v4(x, w1, w2):
    w1t = expand_s2d_kernel_k2(w1)
    w2t = expand_s2d_kernel_k2(w2)
    xs = jnp.pad(space_to_depth(x, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = mask256(conv_valid(xs, w1t))
    y = jax.nn.relu(y)
    y = jax.nn.relu(conv_valid(y, w2t))
    return groupmax256_v4(y)


def main_v4():
    bs = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)), jnp.bfloat16)
    ref = jax.jit(plain_stem)(x, w1, w2)

    f = jax.jit(tiled_stem_v4)
    got = f(x, w1, w2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    g = jax.jit(jax.grad(
        lambda x, w1, w2: (tiled_stem_v4(x, w1, w2).astype(jnp.float32) ** 2).sum(),
        argnums=(1, 2)))
    print(f"tiled_v4  fwd {timeit(f, x, w1, w2):7.2f} ms   "
          f"f+b {timeit(g, x, w1, w2):7.2f} ms   maxerr {err:.4f}", flush=True)
    gp = jax.jit(jax.grad(
        lambda x, w1, w2: (plain_stem(x, w1, w2).astype(jnp.float32) ** 2).sum(),
        argnums=(1, 2)))
    print(f"plain     f+b {timeit(gp, x, w1, w2):7.2f} ms", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "v4":
    main_v4()
