"""Detection post-processing: decode → per-class threshold → NMS → dense output.

Behavioral spec source: reference ``lib/layers/functions/detection.py``
(``class Detect``, SURVEY.md §2.4): decode loc deltas against priors, then
for every class above the background label: keep scores > SCORE_THRESHOLD,
run greedy IoU NMS, keep up to ``top_k``; the output is a dense
``[B, num_classes, top_k, 5]`` tensor of ``(score, x1, y1, x2, y2)`` rows
(zeros in unused slots, background row all-zero).

TPU-first design: one jitted program — classes AND images are ``vmap``-ed
over a fixed-shape NMS (no per-class Python loop, no host sync). Candidate
selection matches the reference's ``nms`` which considers only the ``top_k``
highest-scoring boxes per class.
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
    variance: tuple = (0.1, 0.2)


def _detect_one_class(decoded, scores, score_threshold, iou_threshold, top_k):
    """NMS for one (image, class): returns ``[top_k, 5]`` rows (score, box).

    Candidates are the top_k highest scores (as the reference's nms), already
    sorted descending by ``lax.top_k``, so greedy selection = suppression
    propagation (:func:`sorted_nms`). Kept rows are compacted to the front
    by a stable sort on the keep mask (preserving score order).
    """
    masked = jnp.where(scores > score_threshold, scores, NEG_INF)
    cand_scores, cand_idx = jax.lax.top_k(masked, top_k)
    cand_boxes = decoded[cand_idx]
    keep = sorted_nms(cand_boxes, cand_scores, iou_threshold)
    order = jnp.argsort(~keep, stable=True)  # kept-first, score order kept
    keep_s = keep[order]
    rows = jnp.concatenate([cand_scores[order, None], cand_boxes[order]], axis=-1)
    return jnp.where(keep_s[:, None], rows, 0.0)


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
    top_k = config.max_detections

    def per_image(loc_i, conf_i):
        decoded = decode(loc_i, priors, config.variance)  # [K, 4]
        per_class = jax.vmap(
            lambda s: _detect_one_class(
                decoded, s, config.score_threshold, config.iou_threshold, top_k
            )
        )(conf_i.T)  # [C, top_k, 5]
        # Zero out the background row, as the reference never emits it.
        bg = jnp.arange(per_class.shape[0]) == config.background_label
        return jnp.where(bg[:, None, None], 0.0, per_class)

    return jax.vmap(per_image)(loc, conf.astype(jnp.float32))


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
    top_k = config.max_detections

    def per_image(boxes_i, conf_i):
        per_class = jax.vmap(
            lambda s: _detect_one_class(
                boxes_i, s, config.score_threshold, config.iou_threshold, top_k
            )
        )(conf_i.T)
        bg = jnp.arange(per_class.shape[0]) == config.background_label
        return jnp.where(bg[:, None, None], 0.0, per_class)

    return jax.vmap(per_image)(boxes.astype(jnp.float32), conf.astype(jnp.float32))
