#!/usr/bin/env python
"""Probe: Element-indexed OVERLAPPING blocks as the DMA-free halo pattern.

Round 3/4 blocker (tools/pallas_conv_bisect*.py): Mosaic on this toolchain
HTTP-500s on any kernel that manually DMAs into VMEM scratch and then reads
it shifted/overlapping — the natural way to give a conv kernel its +2-row
halo. Re-tested 2026-08-20 (round 5): still crashes.

THIS probe shows the blocker is moot: ``pl.BlockSpec`` with **all-Element
dims** (``pl.Element(n)`` for every dimension; mixing Element and Blocked
dims is rejected by lowering) lets the index_map return raw ELEMENT
offsets, so consecutive grid steps can read overlapping input windows —
the halo arrives through the automatic pipeline, no manual DMA, no scratch.
Verified: compiles, runs, bit-exact vs the XLA reference on a 3-row
vertical stencil at the stem shape.

Why no conv kernel ships anyway (BENCH_NOTES "floor accepted", round 5):
the 128x128 MXU caps ANY kernel producing 64 output channels at 50%
utilization (~98 TF/s bf16); the shipped space-to-depth tiled stem
(MODEL.S2D_STEM=2, models/layers.py) already reaches ~94 TF/s effective on
the TRUE stem FLOPs (f+b) by restructuring to 256-channel k2 convs at
295 TF/s. The remaining headroom is <5% of stem time (<1% of the train
step) — below measurement noise, not worth three hand-written kernels
(fwd/dgrad/wgrad).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TH, W, C = 30, 300, 64
B = 4


def kern(x_ref, o_ref):
    x = x_ref[0]  # [TH+2, W, C] value read; shifted-value math is fine
    o_ref[0] = x[0:TH] + x[1:TH + 1] + x[2:TH + 2]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 302, W, C)), jnp.bfloat16)
    out = pl.pallas_call(
        kern,
        grid=(B, 300 // TH),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(TH + 2), pl.Element(W), pl.Element(C)),
            # element offsets: row windows [j*TH, j*TH + TH+2) OVERLAP by 2
            lambda i, j: (i, j * TH, 0, 0))],
        out_specs=pl.BlockSpec((1, TH, W, C), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 300, W, C), jnp.bfloat16),
    )(x)
    jax.block_until_ready(out)
    ref = x[:, 0:300] + x[:, 1:301] + x[:, 2:302]
    diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"element-halo stencil: OK, maxdiff={diff}")
    assert diff == 0.0


if __name__ == "__main__":
    main()
