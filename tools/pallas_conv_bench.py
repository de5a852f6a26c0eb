#!/usr/bin/env python
"""Prototype: Pallas 3x3 SAME conv for the VGG stem (300^2, 64->64, bf16).

XLA's conv codegen craters at 300^2 (14.8% of roofline, see BENCH_NOTES
round-2 sweep); this prototypes a Pallas row-tiled kernel that reorganizes
the 3x3 conv as 3 dy-stacked matmuls (contraction 192) to decide whether a
production stem kernel is worth building.

Run on chip: python tools/pallas_conv_bench.py [batch] [TH]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# Pallas kernel: grid (B, H/TH); each program computes [TH, W, Cout] output
# rows from a [TH+2, W+2, Cin] halo block (pl.Element padding fills zeros
# outside, which is exactly SAME-conv semantics).
# ---------------------------------------------------------------------------

def _conv_rows_kernel(xp_ref, w_ref, o_ref, xs_ref, sem, *, th, width, cin,
                      cout):
    # xp_ref: HBM [B, H+2, width, cin]; w_ref: VMEM [3, 3*cin, cout];
    # o_ref: VMEM [1, th, width, cout]; xs_ref: VMEM scratch [th+2, width, cin]
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_ref.at[i, pl.ds(j * th, th + 2)], xs_ref, sem)
    dma.start()
    dma.wait()
    x = jnp.pad(xs_ref[:], ((0, 0), (1, 1), (0, 0)))  # VMEM pad: dx halo
    # dy-stack: [th, width+2, 3*cin]
    xcat = jnp.concatenate([x[dy:dy + th] for dy in range(3)], axis=-1)
    acc = jnp.zeros((th * width, cout), jnp.float32)
    for dx in range(3):
        lhs = xcat[:, dx:dx + width, :].reshape(th * width, 3 * cin)
        acc += jnp.dot(lhs, w_ref[dx], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(th, width, cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def pallas_conv(x, w, th=30):
    b, h, width, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))  # H halo rows
    # w: [3,3,cin,cout] -> per-dx dy-stacked [3, 3*cin, cout]
    wd = w.transpose(1, 0, 2, 3).reshape(3, 3 * cin, cout)
    grid = (b, h // th)
    kernel = functools.partial(_conv_rows_kernel, th=th, width=width,
                               cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3 * cin, cout), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, width, cout),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, width, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * width * 9 * cin * cout,
            bytes_accessed=x.size * 2 * 2,
            transcendentals=0,
        ),
    )(xp, wd)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (bs, 300, 300, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), jnp.bfloat16)

    ref = jax.jit(xla_conv)(x, w)
    print(f"xla_conv       fwd {timeit(jax.jit(xla_conv), x, w):7.2f} ms",
          flush=True)

    for th in (int(sys.argv[2]),) if len(sys.argv) > 2 else (20, 30, 50, 60):
        try:
            out = pallas_conv(x, w, th=th)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = timeit(functools.partial(pallas_conv, th=th), x, w)
            print(f"pallas th={th:3d}  fwd {t:7.2f} ms   maxerr {err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"pallas th={th:3d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
