#!/usr/bin/env python
"""Isolate the optimizer-update cost: per-tensor tree vs one flat vector.

The round-3 step profile shows ~9.8 ms/step of multiply_add fusions for the
SGD+momentum+weight-decay update over the SSD300-VGG16 param tree (~26M
params, 71 tensors) — ~15x the HBM-bandwidth floor. This microbench times
the SAME update (a) per-tensor over the real shape list and (b) over one
concatenated vector, isolated from the train step, to attribute the excess
to per-op overhead vs something inherent.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssds_tpu.config import default_config
from ssds_tpu.models.builder import create_model, init_model


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / n


def main():
    cfg = default_config()
    model, _ = create_model(cfg.MODEL)
    params = init_model(model, cfg.MODEL)["params"]
    n_tensors = len(jax.tree_util.tree_leaves(params))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"{n_tensors} tensors, {n_params/1e6:.1f}M params")

    tx = optax.chain(optax.add_decayed_weights(5e-4),
                     optax.trace(decay=0.9), optax.scale(-1e-3))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    opt_state = tx.init(params)

    @jax.jit
    def tree_update(params, opt_state, grads):
        u, s = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, u), s

    dt = timeit(tree_update, params, opt_state, grads)
    print(f"tree update:  {dt*1e3:7.3f} ms")

    flat = jnp.concatenate([p.ravel() for p in jax.tree_util.tree_leaves(params)])
    gflat = jnp.ones_like(flat)
    fstate = tx.init(flat)

    @jax.jit
    def flat_update(flat, fstate, gflat):
        u, s = tx.update(gflat, fstate, flat)
        return optax.apply_updates(flat, u), s

    dt = timeit(flat_update, flat, fstate, gflat)
    print(f"flat update:  {dt*1e3:7.3f} ms")

    # flatten+update+unflatten round trip (what optax.flatten pays per step)
    treedef = jax.tree_util.tree_structure(params)
    shapes = [p.shape for p in jax.tree_util.tree_leaves(params)]
    sizes = [int(np.prod(s)) for s in shapes]

    @jax.jit
    def roundtrip_update(params, fstate, grads):
        g = jnp.concatenate([p.ravel() for p in jax.tree_util.tree_leaves(grads)])
        f = jnp.concatenate([p.ravel() for p in jax.tree_util.tree_leaves(params)])
        u, s = tx.update(g, fstate, f)
        f = optax.apply_updates(f, u)
        outs, off = [], 0
        for shp, sz in zip(shapes, sizes):
            outs.append(jax.lax.dynamic_slice(f, (off,), (sz,)).reshape(shp))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, outs), s

    dt = timeit(roundtrip_update, params, fstate, grads)
    print(f"roundtrip:    {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
