"""Fixed-shape greedy NMS for TPU.

Behavioral spec source: reference ``box_utils.nms``
(lib/utils/box_utils.py:~220–300, SURVEY.md §2.4): sort candidates by score,
take the ``top_k`` highest, then greedily keep the best-scoring box and
suppress candidates with IoU > overlap, repeating until candidates run out.

TPU-first design: the reference is a data-dependent Python loop. Here the
loop is a ``lax.fori_loop`` with a STATIC trip count (``top_k``) over a
STATIC candidate set, using masking instead of index_select — XLA compiles
one fixed-shape program, and ``vmap`` batches it over classes and images.
Selection order (descending score, greedy suppression) is identical, so the
kept set matches the reference exactly for distinct scores.

A Pallas kernel with the same contract lives in
:mod:`ssds_tpu.ops.pallas.nms` for the single-chip hot path; this module is
the portable reference implementation and the numerical oracle for its tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ssds_tpu.ops.boxes import iou_pairwise, jaccard

# Python float, NOT a jnp array: a module-level jnp constant would
# initialize the default (possibly TPU) backend at import time, breaking
# TPU-free import contracts (dryrun_multichip, tests/test_import_tpu_free).
# Weak typing makes it bit-equivalent to jnp.float32(-1e30) in every use.
NEG_INF = -1e30


@partial(jax.jit, static_argnames=("iou_threshold", "top_k"))
def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    top_k: int = 200,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over one box set.

    Args:
      boxes:  ``[N, 4]`` corner-form boxes.
      scores: ``[N]`` scores; entries <= a large negative sentinel (or -inf)
        are treated as absent (pre-filtered by score threshold).
      iou_threshold: suppress candidates with IoU strictly greater than this.
      top_k: maximum number of boxes kept (static).

    Returns:
      ``keep [top_k]`` int32 indices into ``boxes`` (-1 for unused slots),
      ``keep_scores [top_k]`` (0 for unused slots), and scalar ``count``.
    """
    n = boxes.shape[0]
    active = scores.astype(jnp.float32)
    active = jnp.where(jnp.isfinite(active), active, NEG_INF)

    def body(t, carry):
        active, keep, keep_scores, count = carry
        i = jnp.argmax(active)
        s = active[i]
        valid = s > NEG_INF / 2
        keep = keep.at[t].set(jnp.where(valid, i.astype(jnp.int32), -1))
        keep_scores = keep_scores.at[t].set(jnp.where(valid, s, 0.0))
        ious = iou_pairwise(boxes[i], boxes)  # [N]
        suppress = ious > iou_threshold
        # Always retire the selected box itself (guards zero-area boxes whose
        # self-IoU is 0 and would otherwise be re-selected forever).
        active = jnp.where(valid & suppress, NEG_INF, active)
        active = active.at[i].set(NEG_INF)
        count = count + valid.astype(jnp.int32)
        return active, keep, keep_scores, count

    keep0 = jnp.full((top_k,), -1, dtype=jnp.int32)
    ks0 = jnp.zeros((top_k,), dtype=jnp.float32)
    _, keep, keep_scores, count = jax.lax.fori_loop(
        0, min(top_k, n), body, (active, keep0, ks0, jnp.int32(0))
    )
    return keep, keep_scores, count


def sorted_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Greedy NMS over score-DESCENDING candidates via suppression propagation.

    Equivalent selection to :func:`greedy_nms` when ``scores`` are already
    sorted descending (which is how the reference's ``nms`` consumes them:
    it sorts then walks best-first). Instead of an argmax per step, one IoU
    matrix is computed and a boolean suppression mask is propagated in a
    static-trip-count loop — O(N^2) vector work that XLA/Pallas map onto the
    VPU, no gathers.

    Args:
      boxes:  ``[N, 4]`` corner-form boxes, sorted by descending score.
      scores: ``[N]`` scores (``<= NEG_INF/2`` marks invalid entries).

    Returns:
      ``keep [N]`` bool — True where the box survives.
    """
    n = boxes.shape[0]
    valid = scores > NEG_INF / 2
    ious = jaccard(boxes, boxes)  # [N, N]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]  # strictly-later candidates
    sup_rows = (ious > iou_threshold) & later  # row i suppresses j>i

    def body(i, suppressed):
        keep_i = valid[i] & ~suppressed[i]
        return suppressed | (sup_rows[i] & keep_i)

    suppressed = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    return valid & ~suppressed
