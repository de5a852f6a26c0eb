"""Box-geometry primitives: corner/center forms, IoU, variance encode/decode.

Behavioral spec source: reference ``lib/utils/box_utils.py`` (point_form /
center_size / intersect / jaccard / encode / decode / log_sum_exp; see
SURVEY.md §2.4). Everything here is pure ``jnp``, shape-polymorphic over
leading batch dims, and safe under ``jit`` / ``vmap`` / ``grad``.

Conventions
-----------
- "corner" form: ``(x1, y1, x2, y2)``; "center" form: ``(cx, cy, w, h)``.
- Coordinates are normalized to ``[0, 1]`` relative to the image.
- ``variances = (0.1, 0.2)`` scale the center offsets / log-size offsets
  exactly as in the SSD paper and the reference implementation.
"""

from __future__ import annotations

import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """Convert ``(cx, cy, w, h)`` center-form boxes to ``(x1, y1, x2, y2)``.

    Parity: ``box_utils.point_form`` (reference lib/utils/box_utils.py:~10).
    """
    cxcy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([cxcy - wh / 2.0, cxcy + wh / 2.0], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """Convert corner-form boxes to ``(cx, cy, w, h)`` center form.

    Parity: ``box_utils.center_size`` (reference lib/utils/box_utils.py:~25).
    """
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(mins + maxs) / 2.0, maxs - mins], axis=-1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area between two corner-form box sets.

    ``box_a: [..., A, 4]``, ``box_b: [..., B, 4]`` -> ``[..., A, B]``.
    Parity: ``box_utils.intersect`` (reference lib/utils/box_utils.py:~35).
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-form boxes ``[..., 4] -> [...]``."""
    wh = jnp.clip(boxes[..., 2:] - boxes[..., :2], 0.0)
    return wh[..., 0] * wh[..., 1]


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between corner-form box sets: ``[...,A,4],[...,B,4] -> [...,A,B]``.

    Parity: ``box_utils.jaccard`` (reference lib/utils/box_utils.py:~50).
    """
    inter = intersect(box_a, box_b)
    area_a = area(box_a)[..., :, None]
    area_b = area(box_b)[..., None, :]
    union = area_a + area_b - inter
    # Avoid 0/0 for degenerate (e.g. padded all-zero) boxes.
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)


def iou_pairwise(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU between aligned corner-form boxes ``[..., 4] -> [...]``."""
    max_xy = jnp.minimum(box_a[..., 2:], box_b[..., 2:])
    min_xy = jnp.maximum(box_a[..., :2], box_b[..., :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(box_a) + area(box_b) - inter
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0), 0.0)


def encode(matched: jnp.ndarray, priors: jnp.ndarray, variances=(0.1, 0.2)) -> jnp.ndarray:
    """Encode corner-form GT boxes against center-form priors into SSD offsets.

    ``g_cxcy = (gt_cxcy - prior_cxcy) / (var0 * prior_wh)``
    ``g_wh   = log(gt_wh / prior_wh) / var1``

    ``matched: [..., K, 4]`` corner form; ``priors: [K, 4]`` center form.
    Parity: ``box_utils.encode`` (reference lib/utils/box_utils.py:~110).
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2.0 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    gt_wh = matched[..., 2:] - matched[..., :2]
    # Guard: padded GT rows can have zero w/h; clamp so log stays finite
    # (those rows are masked to background downstream and never train loc).
    g_wh = jnp.log(jnp.maximum(gt_wh, 1e-8) / priors[..., 2:]) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: jnp.ndarray, priors: jnp.ndarray, variances=(0.1, 0.2)) -> jnp.ndarray:
    """Decode predicted SSD offsets against priors into corner-form boxes.

    Inverse of :func:`encode`. ``loc: [..., K, 4]``, ``priors: [K, 4]`` center
    form -> corner-form ``[..., K, 4]``.
    Parity: ``box_utils.decode`` (reference lib/utils/box_utils.py:~140).
    """
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    return jnp.concatenate([cxcy - wh / 2.0, cxcy + wh / 2.0], axis=-1)


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable ``log(sum(exp(x)))`` over the last axis, keepdims.

    Parity: ``box_utils.log_sum_exp`` (reference lib/utils/box_utils.py:~200);
    used by hard-negative mining in MultiBoxLoss.
    """
    x_max = jnp.max(x, axis=-1, keepdims=True)
    return jnp.log(jnp.sum(jnp.exp(x - x_max), axis=-1, keepdims=True)) + x_max
