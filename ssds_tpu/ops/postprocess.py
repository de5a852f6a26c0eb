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
from ssds_tpu.ops.nms import NEG_INF, sorted_nms


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
    return jax.vmap(lambda b, s: sorted_nms(b, s, iou_threshold))(flat_boxes, flat_scores)


def _detect_batched(boxes_per_class, scores, config: PostProcessConfig):
    """Shared tail: per-class top-k, batched NMS, compact, zero background.

    boxes_per_class: ``[B, C, K, 4]`` (or ``[B, 1, K, 4]`` broadcast) decoded
    boxes per class; scores: ``[B, C, K]``.

    The NMS candidate pool is ``top_k`` (>= max_detections) per class; the
    dense output keeps the best ``max_detections`` surviving rows
    (reference ``Detect``: nms(..., top_k) then output MAX_DETECTIONS).
    """
    b, c, k = scores.shape
    top_k = min(max(config.top_k, config.max_detections), k)

    masked = jnp.where(scores > config.score_threshold, scores, NEG_INF)
    # Background slot: mask its scores up front so its top-k gather and NMS
    # propagation are all-invalid no-ops (the row is zeroed below anyway).
    bg_col = jnp.arange(c) == config.background_label
    masked = jnp.where(bg_col[None, :, None], NEG_INF, masked)
    cand_scores, cand_idx = jax.lax.top_k(masked, top_k)  # [B, C, top_k]
    if boxes_per_class.shape[1] == 1:
        # Classes share one box set (SSD/YOLO): gather [B,K,4] by [B,C*top_k]
        # per batch element. This formulation (vs broadcasting to [B,C,K,4]
        # and take_along_axis) never materializes the per-class copy AND is
        # the one that compiles reliably when this program is fused behind
        # the conv forward on TPU (tools/fused_probe.py round 2: the fused
        # broadcast+take_along_axis lowering crashes the TPU worker; the
        # vmapped fancy-index gather is clean and equally fast).
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

    # Compact kept rows to the front (stable: preserves score order).
    order = jnp.argsort(~keep, axis=-1, stable=True)
    keep_s = jnp.take_along_axis(keep, order, axis=-1)
    scores_s = jnp.take_along_axis(cand_scores, order, axis=-1)
    boxes_s = jnp.take_along_axis(cand_boxes, order[..., None], axis=2)
    rows = jnp.concatenate([scores_s[..., None], boxes_s], axis=-1)  # [B,C,top_k,5]
    rows = jnp.where(keep_s[..., None], rows, 0.0)

    bg = jnp.arange(c) == config.background_label
    out = jnp.where(bg[None, :, None, None], 0.0, rows)
    # kept rows are compacted to the front, so truncating the pool to the
    # output size drops only the LOWEST-scoring survivors
    out = out[:, :, : config.max_detections]
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
