"""Detection post-processing: decode → per-class threshold → NMS → dense output.

Behavioral spec source: reference ``lib/layers/functions/detection.py``
(``class Detect``, SURVEY.md §2.4): decode loc deltas against priors, then
for every class above the background label: keep scores > SCORE_THRESHOLD,
run greedy IoU NMS, keep up to ``top_k``; the output is a dense
``[B, num_classes, top_k, 5]`` tensor of ``(score, x1, y1, x2, y2)`` rows
(zeros in unused slots, background row all-zero).

TPU-first design: ONE jitted program for the whole batch — a single
``lax.top_k`` over ``[B, C, K]`` scores selects each class's candidates,
and one batched NMS over all (image × class) slots computes keep masks: the
Pallas kernel (:mod:`ssds_tpu.ops.pallas.nms`) on TPU, the jnp
suppression-propagation oracle elsewhere. No per-class Python loop, no host
sync. Candidate selection matches the reference's ``nms`` which considers
only the ``top_k`` highest-scoring boxes per class.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ssds_tpu.ops.boxes import decode
from ssds_tpu.ops.nms import NEG_INF, sorted_nms_tiled


@dataclasses.dataclass(frozen=True)
class PostProcessConfig:
    """Mirror of the reference's ``cfg.POST_PROCESS`` subtree (SURVEY.md §2.3)."""

    num_classes: int = 21
    background_label: int = 0
    score_threshold: float = 0.01
    iou_threshold: float = 0.6
    max_detections: int = 100
    # Pre-NMS candidate pool per class (reference Detect feeds nms() top_k
    # ~200 candidates, then OUTPUTS up to max_detections): keeping the pool
    # wider than the output prevents suppressed high-rank boxes from
    # starving legitimate lower-ranked detections.
    top_k: int = 200
    variance: tuple = (0.1, 0.2)
    # Class-agnostic pre-prune: before the per-class top-k, keep only the
    # pre_nms_top_n priors with the highest max-over-foreground-classes
    # score (0 = off, exact reference semantics). The per-class [B,C,K]
    # lax.top_k is the single most expensive non-conv op in the batch
    # serving program (tools/b32_profile.py: 6.8 of 27.6 ms at batch 32);
    # pruning K=8732 -> 1024 cuts its input 8.5x at a documented, mAP-
    # neutral approximation: a detection is dropped only if >pre_nms_top_n
    # priors score above it in max-class score AND it would still have made
    # its own class's top-top_k — for trained (peaked) score distributions
    # the global top-1024 covers every above-threshold candidate.
    pre_nms_top_n: int = 0


import os

# The Pallas kernel and the XLA suppression-propagation path compute the
# same mask; XLA fuses the latter into the surrounding detect program and
# compiles much faster, so it is the default. Set SSDS_TPU_PALLAS_NMS=1 to
# route through the standalone Pallas kernel.
_USE_PALLAS = os.environ.get("SSDS_TPU_PALLAS_NMS", "0") == "1"


def _nms_mask(flat_boxes, flat_scores, iou_threshold):
    """Batched keep mask over [M, N] candidate slots."""
    if _USE_PALLAS and jax.default_backend() == "tpu":
        from ssds_tpu.ops.pallas.nms import nms_mask_pallas

        return nms_mask_pallas(flat_boxes, flat_scores, iou_threshold)
    return sorted_nms_tiled(flat_boxes, flat_scores, iou_threshold)


def _static_ge(dim, n: int) -> bool:
    """``dim >= n`` for a static trace-time dimension, False when ``dim``
    is a symbolic dimension whose relation to ``n`` is inconclusive (the
    ``jax.export`` symbolic-batch path: artifacts must serve ANY batch
    size, so symbolic batches take the formulation that is correct and
    proven at every size — the fancy-index gather and no prune)."""
    try:
        return bool(dim >= n)
    except Exception:  # jax InconclusiveDimensionOperation
        return False


def _gather_rows_exact(src, idx, n):
    """``src[b, idx[b, m]]`` as a one-hot matmul — BIT-EXACT and much faster
    than the fancy-index gather when the gathered buffer must be
    materialized (multiple consumers force that here: NMS reads the
    candidate boxes too, so XLA cannot stream the gather into its consumer
    and the 4-float rows land at 4/128 lane utilization — measured 2.7 ms
    for the [32, 81*200] COCO candidate gather vs 1.2 ms as a dot).

    Exactness: each output element is sum_j onehot[j] * x[j] with exactly
    one nonzero term, and ``Precision.HIGHEST`` computes x's 3-term bf16
    split (8+8+8 mantissa bits = the full f32 24) with 1.0 * split_k exact
    and the f32 accumulation of disjoint-exponent parts exact — so the f32
    row is reconstructed bit-for-bit (pinned vs the index gather in
    tests/test_postprocess.py::test_onehot_gather_bit_exact).

    Args:
      src: ``[B, N, D]`` float32 rows.
      idx: ``[B, M]`` int32 row indices.
      n:   static N.

    Returns: ``[B, M, D]`` gathered rows.
    """
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)  # [B, M, N]
    return jax.lax.dot_general(
        oh, src, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)


def _gather_rows_exact_per_class(src, idx_bck, n):
    """Per-class chunked variant of :func:`_gather_rows_exact` for indices
    with a ``[B, C, K]`` class structure: one small ``[B,K,N]x[B,N,D]`` dot
    per class via ``lax.map`` instead of one ``[B,C*K,N]`` dot. Same
    bit-exact result; measured 1.9 ms faster at the 81-class COCO serving
    shape (the big dot's output layout, forced by the NMS consumer, tiles
    poorly — the chunked writes don't; tools/gather_variants_bench.py
    session notes in BENCH_NOTES).
    """
    def per_class(c_idx):  # [B, K] -> [B, K, D]
        oh = jax.nn.one_hot(c_idx, n, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, src, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(per_class, jnp.swapaxes(idx_bck, 0, 1))  # [C, B, K, D]
    return jnp.swapaxes(out, 0, 1)  # [B, C, K, D]


def _detect_batched(boxes_per_class, scores, config: PostProcessConfig):
    """Shared tail: per-class top-k, batched NMS, compact, zero background.

    boxes_per_class: ``[B, C, K, 4]`` (or ``[B, 1, K, 4]`` broadcast) decoded
    boxes per class; scores: ``[B, C, K]``.

    The NMS candidate pool is ``top_k`` (>= max_detections) per class; the
    dense output keeps the best ``max_detections`` surviving rows
    (reference ``Detect``: nms(..., top_k) then output MAX_DETECTIONS).
    """
    b, c, k = scores.shape

    masked = jnp.where(scores > config.score_threshold, scores, NEG_INF)
    # Background slot: mask its scores up front so its top-k gather and NMS
    # propagation are all-invalid no-ops (the row is zeroed below anyway).
    bg_col = jnp.arange(c) == config.background_label
    masked = jnp.where(bg_col[None, :, None], NEG_INF, masked)

    if (0 < config.pre_nms_top_n < k and boxes_per_class.shape[1] == 1
            and _static_ge(b, 4)):
        # Class-agnostic prune (see PostProcessConfig.pre_nms_top_n): one
        # cheap [B,K] top-k by max-class score replaces most of the
        # per-class [B,C,K] sort work. Gated on batch >= 4 (a static,
        # trace-time property): at batch 1 the per-class sort is already
        # small and the prune's own [1,K] top-k ADDS ~0.2 ms of latency
        # (measured: 844 -> 723 img/s batch-1), while at batch 32 the prune
        # is a 1.5x throughput win (1087 -> 1641 img/s).
        best = jnp.max(masked, axis=1)  # [B, K]
        _, pool_idx = jax.lax.top_k(best, config.pre_nms_top_n)  # [B, N]
        masked = jax.vmap(lambda s, i: s[:, i])(masked, pool_idx)  # [B,C,N]
        boxes_per_class = jax.vmap(lambda bx, i: bx[i])(
            boxes_per_class[:, 0], pool_idx)[:, None]  # [B,1,N,4]
        k = config.pre_nms_top_n

    top_k = min(max(config.top_k, config.max_detections), k)
    cand_scores, cand_idx = jax.lax.top_k(masked, top_k)  # [B, C, top_k]
    if boxes_per_class.shape[1] == 1:
        # Classes share one box set (SSD/YOLO): gather [B,K,4] by [B,C*top_k]
        # per batch element. At batch >= 4 the gather is the one-hot matmul
        # (bit-exact, see _gather_rows_exact: with NMS as a second consumer
        # the gathered buffer is materialized and the fancy-index form runs
        # at 4/128 lane utilization — at the 81-class COCO shape the dot is
        # >2x faster and at 21-class VOC ~equal). At batch 1 the fancy-index
        # gather measures slightly faster and is the formulation proven to
        # fuse reliably behind the conv forward (tools/fused_probe.py round
        # 2: fused broadcast+take_along_axis crashes the TPU worker; the
        # vmapped fancy-index gather is clean).
        if _static_ge(b, 4) and c >= 32:
            # Many classes (COCO): the big [B,C*top_k,N] dot's output
            # layout, forced by the NMS consumer, tiles poorly — the
            # per-class chunked dots measure 2x faster (2.5 vs 4.4 ms in
            # context at C=81) and took SSDLite-COCO b32 serving
            # 3592 -> 4497 img/s. Few classes (VOC): the big dot is equal
            # at fp and ~7% faster at int8 b128, so it stays below C=32.
            cand_boxes = _gather_rows_exact_per_class(
                boxes_per_class[:, 0], cand_idx, k)  # [B, C, top_k, 4]
        elif _static_ge(b, 4):
            cand_boxes = _gather_rows_exact(
                boxes_per_class[:, 0], cand_idx.reshape(b, -1), k
            ).reshape(b, c, top_k, 4)
        else:
            cand_boxes = jax.vmap(lambda bx, i: bx[i])(
                boxes_per_class[:, 0], cand_idx.reshape(b, -1)
            ).reshape(b, c, top_k, 4)
    else:
        cand_boxes = jnp.take_along_axis(
            boxes_per_class, cand_idx[..., None], axis=2)  # [B, C, top_k, 4]

    keep = _nms_mask(
        cand_boxes.reshape(b * c, top_k, 4),
        cand_scores.reshape(b * c, top_k),
        config.iou_threshold,
    ).reshape(b, c, top_k)

    # Compact kept rows to the front and truncate to max_detections in ONE
    # small top-k: candidates are already score-descending, so selecting the
    # max_detections highest KEPT scores (index tie-break preserves order)
    # yields exactly the first max_detections survivors — equivalent to the
    # stable argsort-partition it replaces, at a fraction of the cost
    # (tools/b32_profile.py: the argsort+3-gather tail was 4.3 ms of the
    # 27.6 ms batch-32 program).
    out_k = min(config.max_detections, top_k)
    kept_scores = jnp.where(keep, cand_scores, NEG_INF)
    final_s, final_i = jax.lax.top_k(kept_scores, out_k)  # [B, C, out_k]
    if _static_ge(b, 4):
        # Same one-hot-matmul trade as the candidate gather above: this
        # [B*C, out_k] row gather from the materialized candidate boxes was
        # 2.4 ms of the 12.7 ms COCO batch-32 program as take_along_axis.
        final_b = _gather_rows_exact(
            cand_boxes.reshape(b * c, top_k, 4),
            final_i.reshape(b * c, out_k), top_k).reshape(b, c, out_k, 4)
    else:
        final_b = jnp.take_along_axis(cand_boxes, final_i[..., None], axis=2)
    rows = jnp.concatenate([final_s[..., None], final_b], axis=-1)
    rows = jnp.where((final_s > NEG_INF / 2)[..., None], rows, 0.0)

    bg = jnp.arange(c) == config.background_label
    out = jnp.where(bg[None, :, None, None], 0.0, rows)
    if out.shape[2] < config.max_detections:
        pad = config.max_detections - out.shape[2]
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return out


@partial(jax.jit, static_argnames=("config",))
def detect(
    loc: jnp.ndarray,
    conf: jnp.ndarray,
    priors: jnp.ndarray,
    config: PostProcessConfig = PostProcessConfig(),
) -> jnp.ndarray:
    """Full Detect forward.

    Args:
      loc:    ``[B, K, 4]`` predicted offsets.
      conf:   ``[B, K, C]`` class probabilities (post-softmax, as the
              reference's 'eval' phase emits).
      priors: ``[K, 4]`` center-form anchors.

    Returns:
      ``[B, C, top_k, 5]`` dense detections ``(score, x1, y1, x2, y2)``.
    """
    decoded = decode(loc.astype(jnp.float32), priors, config.variance)  # [B, K, 4]
    scores = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)  # [B, C, K]
    return _detect_batched(decoded[:, None], scores, config)


@partial(jax.jit, static_argnames=("config",))
def detect_decoded(
    boxes: jnp.ndarray,
    conf: jnp.ndarray,
    config: PostProcessConfig = PostProcessConfig(),
) -> jnp.ndarray:
    """Detect over ALREADY-DECODED boxes (the YOLO eval path, whose decoding
    is per-cell rather than prior-based — see models/heads/yolo.py).

    Args:
      boxes: ``[B, K, 4]`` corner-form normalized boxes.
      conf:  ``[B, K, C]`` class scores (background column included).

    Returns:
      ``[B, C, top_k, 5]`` dense detections, same contract as :func:`detect`.
    """
    scores = jnp.swapaxes(conf.astype(jnp.float32), 1, 2)  # [B, C, K]
    return _detect_batched(boxes.astype(jnp.float32)[:, None], scores, config)
