#!/usr/bin/env python
"""Bisect 3: grid+DMA combinations that crash Mosaic."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, W, C = 30, 300, 64
B = 4


def run_grid(name, kernel, *, dma, out_lead1=True):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 302, W, C)), jnp.bfloat16)
    try:
        if dma:
            in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
            scratch = [pltpu.VMEM((TH + 2, W, C), jnp.bfloat16),
                       pltpu.SemaphoreType.DMA(())]
        else:
            in_specs = [pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0))]
            scratch = []
        out = pl.pallas_call(
            kernel,
            grid=(B, 300 // TH),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 300, W, C), jnp.bfloat16),
            scratch_shapes=scratch,
        )(x)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


def dma_in(xp_ref, xs_ref, sem):
    i, j = pl.program_id(0), pl.program_id(1)
    dma = pltpu.make_async_copy(xp_ref.at[i, pl.ds(j * TH, TH + 2)], xs_ref, sem)
    dma.start()
    dma.wait()


def g_pad_nodma(x_ref, o_ref):
    x = jnp.pad(x_ref[0], ((0, 0), (1, 1), (0, 0)))
    o_ref[0] = x[:, 1:W + 1]


def g_dma_add(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    o_ref[0] = xs_ref[0:TH] + xs_ref[1:TH + 1] + xs_ref[2:TH + 2]


def g_dma_pad(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = jnp.pad(xs_ref[:], ((0, 0), (1, 1), (0, 0)))
    o_ref[0] = x[0:TH, 1:W + 1]


def g_dma_pad_read(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = jnp.pad(xs_ref[:], ((0, 0), (1, 1), (0, 0)))
    # consume the pad columns so they can't be optimized out
    o_ref[0] = x[0:TH, 0:W] + x[0:TH, 2:W + 2]


def g_dma_cat(xp_ref, o_ref, xs_ref, sem):
    dma_in(xp_ref, xs_ref, sem)
    x = xs_ref[:]
    xcat = jnp.concatenate([x[dy:dy + TH] for dy in range(3)], axis=-1)
    o_ref[0] = xcat[:, :, 0:C] + xcat[:, :, C:2 * C] + xcat[:, :, 2 * C:]


def main():
    run_grid("pad_nodma", g_pad_nodma, dma=False)
    run_grid("dma_add", g_dma_add, dma=True)
    run_grid("dma_pad", g_dma_pad, dma=True)
    run_grid("dma_pad_read", g_dma_pad_read, dma=True)
    run_grid("dma_cat", g_dma_cat, dma=True)


if __name__ == "__main__":
    main()
