#!/usr/bin/env python
"""Standalone bench of batched-NMS formulations at the batch-32 serving
shape ([672, 200] slots) on random-init-like data (worst case: dense
overlaps, deep suppression chains). Informs ops/postprocess._nms_mask.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from ssds_tpu.ops.boxes import jaccard
from ssds_tpu.ops.nms import NEG_INF, sorted_nms, sorted_nms_batched

M, N = 672, 200
TILE = 20


def make_data(seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 0.8, (M, N, 2))
    wh = rng.uniform(0.05, 0.4, (M, N, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1, (M, N)).astype(np.float32))[:, ::-1]
    return jnp.asarray(boxes), jnp.asarray(scores.copy())


def nms_sequential(boxes, scores, thr=0.6):
    return jax.vmap(lambda b, s: sorted_nms(b, s, thr))(boxes, scores)


def nms_fixpoint(boxes, scores, thr=0.6):
    return sorted_nms_batched(boxes, scores, thr)


def nms_tiled(boxes, scores, thr=0.6):
    """TF-style: sequential over tiles; within a tile, fixpoint iteration;
    across tiles, one masked matmul applies all earlier kept boxes."""
    valid = scores > NEG_INF / 2
    n_tiles = N // TILE
    bt = boxes.reshape(M, n_tiles, TILE, 4)

    idx = jnp.arange(TILE)
    later = (idx[None, :] > idx[:, None]).astype(jnp.float32)

    def outer(t, keep):
        tb = jax.lax.dynamic_slice_in_dim(bt, t, 1, axis=1)[:, 0]  # [M,TILE,4]
        # suppression from kept boxes in EARLIER tiles vs this tile
        ious = jax.vmap(jaccard)(boxes, tb)  # [M, N, TILE]
        prev = (jnp.arange(N) < t * TILE)[None, :, None]
        hit0 = jnp.any((ious > thr) & prev & keep[:, :, None], axis=1)  # [M,TILE]
        tv = jax.lax.dynamic_slice_in_dim(valid, t * TILE, TILE, axis=1) & ~hit0
        # within-tile fixpoint (chains inside 32 are short)
        ii = jax.vmap(jaccard)(tb, tb)
        supf = ((ii > thr).astype(jnp.float32) * later[None])
        def body(c):
            k, _, it = c
            hit = jax.lax.dot_general(
                k.astype(jnp.float32)[:, None, :], supf,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0] > 0
            nk = tv & ~hit
            return nk, jnp.any(nk != k), it + 1
        def cond(c):
            return c[1] & (c[2] < TILE)
        tk, _, _ = jax.lax.while_loop(cond, body, (tv, jnp.bool_(True), 0))
        return jax.lax.dynamic_update_slice_in_dim(keep, tk, t * TILE, axis=1)

    keep = jnp.zeros((M, N), bool)
    # tile 0 has no predecessors; handled uniformly (hit0 empty mask)
    return jax.lax.fori_loop(0, n_tiles, outer, keep)


def bench(name, fn, boxes, scores):
    jf = jax.jit(fn)
    out = jf(boxes, scores)
    jax.device_get(out)
    def run(iters):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf(boxes, scores)
        jax.device_get(o.sum())
        return time.perf_counter() - t0
    run(5)
    n = 30
    ms = sorted((run(2 * n) - run(n)) / n for _ in range(3))[1] * 1e3
    print(f"{name:12s} {ms:7.3f} ms", flush=True)
    return np.asarray(out)


def main():
    boxes, scores = make_data(0)
    ref = bench("sequential", nms_sequential, boxes, scores)
    fx = bench("fixpoint", nms_fixpoint, boxes, scores)
    tl = bench("tiled", nms_tiled, boxes, scores)
    print("fixpoint exact:", (ref == fx).all(), " tiled exact:", (ref == tl).all())


if __name__ == "__main__":
    main()
