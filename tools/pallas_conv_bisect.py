#!/usr/bin/env python
"""Bisect which construct in the prototype conv kernel crashes Mosaic."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, W, C = 30, 300, 64


def run_case(name, kernel, out_shape, x, wd=None):
    try:
        args = [x] if wd is None else [x, wd]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        if wd is not None:
            in_specs.append(pl.BlockSpec((3, 3 * C, C), lambda i, j: (0, 0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(x.shape[0], 300 // TH),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1,) + out_shape, lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((x.shape[0], (300 // TH) * out_shape[0]) + out_shape[1:], jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((TH + 2, W, C), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        )(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return None


def dma_in(xp_ref, xs_ref, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(xp_ref.at[i, pl.ds(j * TH, TH + 2)], xs_ref, sem)
    dma.start()
    dma.wait()


def k_copy(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    o_ref[0] = xs_ref[0:TH]


def k_pad(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = jnp.pad(xs_ref[:], ((0, 0), (1, 1), (0, 0)))
    o_ref[0] = x[0:TH, 1:W + 1]


def k_cat(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = xs_ref[:]
    xcat = jnp.concatenate([x[dy:dy + TH] for dy in range(3)], axis=-1)
    o_ref[0] = xcat[:, :, 0:C] + xcat[:, :, C:2 * C] + xcat[:, :, 2 * C:]


def k_reshape(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = xs_ref[:]
    xcat = jnp.concatenate([x[dy:dy + TH] for dy in range(3)], axis=-1)
    flat = xcat.reshape(TH * W, 3 * C)
    o_ref[0] = (flat[:, 0:C] + flat[:, C:2 * C] + flat[:, 2 * C:]).reshape(TH, W, C)


def k_dot(xp_ref, w_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = xs_ref[:]
    xcat = jnp.concatenate([x[dy:dy + TH] for dy in range(3)], axis=-1)
    flat = xcat[0:TH].reshape(TH * W, 3 * C)
    acc = jnp.dot(flat, w_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(TH, W, C).astype(jnp.bfloat16)


def k_dot3d(xp_ref, w_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = xs_ref[:]
    xcat = jnp.concatenate([x[dy:dy + TH] for dy in range(3)], axis=-1)
    acc = jax.lax.dot_general(xcat, w_ref[0],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    b = 4
    x = jnp.asarray(rng.normal(0, 1, (b, 302, W, C)), jnp.bfloat16)
    wd = jnp.asarray(rng.normal(0, 0.05, (3, 3 * C, C)), jnp.bfloat16)

    run_case("copy", k_copy, (TH, W, C), x)
    run_case("pad", k_pad, (TH, W, C), x)
    run_case("cat", k_cat, (TH, W, C), x)
    run_case("reshape", k_reshape, (TH, W, C), x)
    run_case("dot", k_dot, (TH, W, C), x, wd)
    run_case("dot3d", k_dot3d, (TH, W, C), x, wd)


if __name__ == "__main__":
    main()
