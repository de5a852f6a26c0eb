#!/usr/bin/env python
"""Box-gather formulations at the COCO postprocess shape, measured.

The SSDLite-COCO serving profile (tools/serve_profile.py --full) shows the
two box gathers dominate the non-conv program: the [B, C*top_k] candidate
gather (postprocess.py:120, 2.31 ms) and the final-compaction gather
(:143, 2.37 ms) — together 4.7 ms of a 12.7 ms batch-32 step, running at
5-9 GB/s because each gathered row is 4 floats in a 128-lane vector.
This bench measures exact alternatives at that shape (B=32, N=1024 pool,
C=81, top_k=200 => 16200 rows/image).

Run on the chip: python tools/gather_variants_bench.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu.compile_cache import enable_compile_cache

B, N, C, K = 32, 1024, 81, 200
M = C * K  # rows gathered per image


def measure(fn, *args, iters=50):
    out = jax.jit(fn)
    r = out(*args)
    jax.block_until_ready(r)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = out(*args)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(iters)
    samples = sorted((run(2 * iters) - run(iters)) / iters for _ in range(5))
    return samples[len(samples) // 2] * 1e3, r


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    boxes = jnp.asarray(rng.uniform(0, 1, (B, N, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, M)), jnp.int32)

    # (a) current: vmapped fancy-index row gather
    def v_fancy(bx, ix):
        return jax.vmap(lambda b, i: b[i])(bx, ix)

    # (b) take_along_axis
    def v_taa(bx, ix):
        return jnp.take_along_axis(bx, ix[..., None], axis=1)

    # (c) four per-coordinate scalar gathers from [B, N]
    def v_coord(bx, ix):
        cols = [jax.vmap(lambda b, i: b[i])(bx[..., d], ix) for d in range(4)]
        return jnp.stack(cols, axis=-1)

    # (d) gather along lanes: boxes as [B, 4, N], idx broadcast
    def v_lanes(bx, ix):
        bt = jnp.swapaxes(bx, 1, 2)  # [B, 4, N]
        g = jax.vmap(lambda b, i: b[:, i])(bt, ix)  # [B, 4, M]
        return jnp.swapaxes(g, 1, 2)

    # (e) one-hot matmul, chunked over classes, precision HIGHEST
    #     (bit-exact for 0/1 one-hot: the 3-term bf16 split of the box
    #     operand is reconstructed exactly by the f32 accumulator)
    def v_onehot(bx, ix):
        ixc = ix.reshape(B, C, K)

        def per_class(c_idx):  # [B, K] -> [B, K, 4]
            oh = jax.nn.one_hot(c_idx, N, dtype=jnp.float32)  # [B, K, N]
            return jax.lax.dot_general(
                oh, bx, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)

        out = jax.lax.map(per_class, jnp.swapaxes(ixc, 0, 1))  # [C, B, K, 4]
        return jnp.swapaxes(out, 0, 1).reshape(B, M, 4)

    # (f) one-hot matmul, single big batched dot (materializes [B, M, N])
    def v_onehot_big(bx, ix):
        oh = jax.nn.one_hot(ix, N, dtype=jnp.float32)  # [B, M, N]
        return jax.lax.dot_general(
            oh, bx, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)

    ref = None
    for name, fn in [("fancy_vmap(current)", v_fancy), ("take_along", v_taa),
                     ("coord4", v_coord), ("lane_gather", v_lanes),
                     ("onehot_chunked", v_onehot), ("onehot_big", v_onehot_big)]:
        try:
            ms, r = measure(fn, boxes, idx)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        r = r.reshape(B, M, 4)
        if ref is None:
            ref = np.asarray(r)
            exact = True
        else:
            exact = bool(np.array_equal(ref, np.asarray(r)))
        gbps = (M * B * 4 * 4) / (ms / 1e3) / 1e9
        print(f"{name:>20}: {ms:7.3f} ms  out {gbps:6.1f} GB/s  "
              f"bit-exact={exact}", flush=True)


if __name__ == "__main__":
    main()
