"""Pallas TPU kernel: batched greedy NMS over sorted candidates.

The reference's NMS is a per-class Python loop on the host
(``lib/utils/box_utils.py:~220–300``, SURVEY.md §2.9) — the designated
native-equivalent obligation. Contract matches
:func:`ssds_tpu.ops.nms.sorted_nms` (the jnp oracle): candidates arrive
sorted by descending score; greedy selection == suppression-mask
propagation over the IoU matrix.

Kernel shape: grid over blocks of SLOT_TILE=8 flattened (image × class)
slots — the TPU sublane granule — with candidates padded to a 128-lane
multiple. Per block, 8 IoU matrices ([8, N, N] f32 ≈ 512 KB at N=128) are
computed on the VPU, then one static N-step ``fori_loop`` propagates all 8
suppression masks in lockstep — no gathers, no host sync, one kernel for
every class of every image in the batch.

Measured (v5e, M=168 slots, N=100→128): kernel 0.79 ms, bit-identical to
the oracle. The XLA-compiled oracle fuses into the surrounding detect
program and runs 0.32 ms, so XLA remains the production default
(``SSDS_TPU_PALLAS_NMS=1`` opts in); the kernel stands as the native-NMS
obligation (SURVEY.md §2.9).

RETIREMENT DECISION (round 3): the once-planned fused Pallas
decode+top-k+NMS kernel is formally retired on the measurements. Every
piece it would replace already loses to (or matches) XLA's fusion of the
same math: this NMS kernel standalone is 2.5× slower than the fused XLA
oracle (0.79 vs 0.32 ms); the candidate top-k — the largest postprocess
cost at ~18% of the batch-1 predict program — was attacked with
``lax.approx_max_k`` and measured SLOWER than the exact ``lax.top_k``
(635 vs 704 img/s, BENCH_NOTES round 2); and decode is an elementwise
chain XLA fuses into the conv epilogue for free. A hand-fused kernel
could at best recover a fraction of ~0.2 ms in a ~1.2 ms program whose
run-to-run variance on this backend exceeds that; the compute-path
leverage lives in the train-side convs (see the tiled stem /
``MODEL.S2D_STAGES``), not here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Python floats (NOT jnp scalars): jnp constants would be captured by the
# kernel as traced consts, which pallas_call rejects.
NEG_INF = -1e30
_VALID_CUTOFF = NEG_INF / 2

SLOT_TILE = 8  # slots processed per grid step (sublane granule)


def _nms_kernel(boxes_ref, scores_ref, keep_ref, *, iou_threshold: float):
    # boxes_ref: [S, N, 4]; scores_ref: [S, N]; keep_ref: [S, N] float32
    boxes = boxes_ref[:]  # [S, N, 4]
    scores = scores_ref[:]  # [S, N]
    s, n, _ = boxes.shape

    x1, y1 = boxes[..., 0], boxes[..., 1]  # [S, N]
    x2, y2 = boxes[..., 2], boxes[..., 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    # Pairwise IoU per slot (axis 1 = suppressor i, axis 2 = candidate j).
    ix1 = jnp.maximum(x1[:, :, None], x1[:, None, :])
    iy1 = jnp.maximum(y1[:, :, None], y1[:, None, :])
    ix2 = jnp.minimum(x2[:, :, None], x2[:, None, :])
    iy2 = jnp.minimum(y2[:, :, None], y2[:, None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, :, None] + area[:, None, :] - inter
    iou = jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, n), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (s, n, n), 2)
    # row i suppresses strictly-later j with IoU above threshold
    sup = jnp.where((iou > iou_threshold) & (col_ids > row_ids), 1.0, 0.0)

    valid = jnp.where(scores > _VALID_CUTOFF, 1.0, 0.0)  # [S, N]
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, n), 1)  # candidate index

    # Mosaic cannot dynamic-slice VALUES along the lane axis, so step i
    # selects its row/scalar with an iota==i mask + reduction instead.
    def body(i, suppressed):
        sel = (lane == i).astype(jnp.float32)  # [S, N] one-hot on lane i
        keep_i = jnp.sum(valid * (1.0 - suppressed) * sel, axis=1)  # [S]
        row_i = jnp.sum(sup * sel[:, :, None], axis=1)  # [S, N] = sup[:, i, :]
        return jnp.maximum(suppressed, row_i * keep_i[:, None])

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((s, n), jnp.float32))
    keep_ref[:] = valid * (1.0 - suppressed)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def nms_mask_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy-NMS keep mask.

    Args:
      boxes:  ``[M, N, 4]`` corner-form candidates, score-sorted descending.
      scores: ``[M, N]`` (``<= NEG_INF/2`` marks invalid/padded entries).

    Returns:
      ``[M, N]`` bool keep mask, identical to
      ``vmap(sorted_nms)(boxes, scores)``.
    """
    m, n, _ = boxes.shape
    # Pad slots to the tile granule and candidates to the lane granule.
    m_pad = -m % SLOT_TILE
    n_pad = -n % 128
    boxes = jnp.pad(boxes.astype(jnp.float32), ((0, m_pad), (0, n_pad), (0, 0)))
    scores = jnp.pad(
        scores.astype(jnp.float32), ((0, m_pad), (0, n_pad)),
        constant_values=NEG_INF,
    )
    mp, np_ = m + m_pad, n + n_pad
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold),
        grid=(mp // SLOT_TILE,),
        in_specs=[
            pl.BlockSpec((SLOT_TILE, np_, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SLOT_TILE, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SLOT_TILE, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret,
    )(boxes, scores)
    return out[:m, :n] > 0.5
