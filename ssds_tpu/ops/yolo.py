"""YOLO box decoding and the v3-style training loss.

Behavioral spec source: the YOLO9000 / YOLOv3 papers (the reference's
``lib/modeling/ssds/yolo.py`` implements the inference graph; its v0 training
path was flagged uncertain — SURVEY.md §2.5 — so the loss here follows the
published YOLOv3 recipe directly).

Decoding (per cell (i,j), anchor a, stride s, image (Hi, Wi))::

    bx = (j + sigmoid(tx)) / W_grid        bw = anchor_w * exp(tw) / Wi
    by = (i + sigmoid(ty)) / H_grid        bh = anchor_h * exp(th) / Hi

All outputs are normalized [0,1] corner-form boxes, matching the SSD
post-processing conventions.

Loss (YOLOv3): each valid GT is assigned to its best wh-IoU anchor across all
scales; positives get MSE on (sigmoid(tx), sigmoid(ty)) and raw (tw, th) with
the ``2 - w*h`` small-box upweighting, BCE per-class, and BCE objectness=1;
all other cells get BCE objectness=0 except those whose best decoded IoU with
any GT exceeds the ignore threshold. Positive terms are computed by GATHERING
predictions at GT locations (loss per GT row — static shapes, no scatter of
targets); only the objectness positive mask is scattered densely.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ssds_tpu.ops.boxes import iou_pairwise, jaccard


def decode_scale(
    raw: jnp.ndarray, anchors_px: jnp.ndarray, img_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode one scale's raw output.

    Args:
      raw: ``[B, H, W, A, 5+C]``.
      anchors_px: ``[A, 2]`` (w, h) pixel anchors.
      img_hw: input image (height, width) in pixels.

    Returns:
      boxes ``[B, H*W*A, 4]`` corner-form normalized, objectness
      ``[B, H*W*A]`` (post-sigmoid), class logits ``[B, H*W*A, C]``.
    """
    b, h, w, a, _ = raw.shape
    img_h, img_w = img_hw
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)  # column index j
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)  # row index i
    cx = (gx[None, :, :, None] + jax.nn.sigmoid(raw[..., 0])) / w
    cy = (gy[None, :, :, None] + jax.nn.sigmoid(raw[..., 1])) / h
    anchors = anchors_px.astype(jnp.float32)
    bw = anchors[None, None, None, :, 0] * jnp.exp(raw[..., 2]) / img_w
    bh = anchors[None, None, None, :, 1] * jnp.exp(raw[..., 3]) / img_h
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    obj = jax.nn.sigmoid(raw[..., 4])
    cls = raw[..., 5:]
    k = h * w * a
    return boxes.reshape(b, k, 4), obj.reshape(b, k), cls.reshape(b, k, -1)


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy from logits (stable).

    softplus(x) - x*t: gradient is exactly ``sigmoid(x) - t`` everywhere.
    (The max(x,0)+log1p(exp(-|x|)) form has a spurious zero subgradient at
    x == 0 — |x| and max cancel — which freezes logits initialized at 0.)
    """
    return jax.nn.softplus(logits) - logits * targets


def yolo_loss(
    raw_outputs: Sequence[jnp.ndarray],
    anchors_per_scale: Sequence,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_hw: Tuple[int, int],
    *,
    ignore_threshold: float = 0.5,
    noobj_weight: float = 1.0,
    coord_weight: float = 5.0,
    class_weight: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """YOLOv3 multi-scale loss.

    Args:
      raw_outputs: per-scale ``[B, H, W, A, 5+C]`` raw head outputs,
        highest-resolution scale first.
      anchors_per_scale: per-scale ``[A, 2]`` pixel anchors (same order).
      gt_boxes: ``[B, G, 4]`` corner-form normalized, zero-padded.
      gt_labels: ``[B, G]`` int class ids (0-based, no background).
      gt_valid: ``[B, G]`` bool.

    Returns:
      ``(loss_loc, loss_conf)`` scalars, normalized by batch size —
      mirroring the reference's two-term (loc, conf) reporting convention.
    """
    img_h, img_w = img_hw
    b, g = gt_labels.shape

    anchors_list = [jnp.asarray(a, jnp.float32) for a in anchors_per_scale]
    all_anchors = jnp.concatenate(anchors_list)  # [sumA, 2]
    scale_offsets = []
    off = 0
    for a in anchors_list:
        scale_offsets.append(off)
        off += a.shape[0]

    # Best anchor (across all scales) per GT, by wh-IoU.
    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0]
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1]
    gt_wh_px = jnp.stack([gt_w * img_w, gt_h * img_h], axis=-1)  # [B, G, 2]
    inter = jnp.minimum(gt_wh_px[..., None, 0], all_anchors[None, None, :, 0]) * jnp.minimum(
        gt_wh_px[..., None, 1], all_anchors[None, None, :, 1]
    )
    union = (gt_wh_px[..., 0] * gt_wh_px[..., 1])[..., None] + (
        all_anchors[:, 0] * all_anchors[:, 1]
    )[None, None, :] - inter
    wh_iou = inter / jnp.maximum(union, 1e-9)  # [B, G, sumA]
    best_anchor = jnp.argmax(wh_iou, axis=-1)  # [B, G]

    gt_cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2.0
    gt_cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2.0
    batch_idx = jnp.arange(b)[:, None]  # [B, 1]

    total_loc = jnp.float32(0.0)
    total_conf = jnp.float32(0.0)

    for raw, anchors_px, a_off in zip(raw_outputs, anchors_list, scale_offsets):
        _, h, w, a, ch = raw.shape
        c = ch - 5
        k = h * w * a
        raw_flat = raw.reshape(b, k, ch).astype(jnp.float32)

        on_scale = (best_anchor >= a_off) & (best_anchor < a_off + a) & gt_valid  # [B, G]
        a_idx = jnp.clip(best_anchor - a_off, 0, a - 1)
        cell_x = jnp.clip((gt_cx * w).astype(jnp.int32), 0, w - 1)
        cell_y = jnp.clip((gt_cy * h).astype(jnp.int32), 0, h - 1)
        flat_idx = (cell_y * w + cell_x) * a + a_idx  # [B, G]

        # --- positive terms: gather predictions at each GT's cell-anchor ---
        pred = raw_flat[batch_idx, flat_idx]  # [B, G, 5+C]
        onf = on_scale.astype(jnp.float32)
        tx = gt_cx * w - cell_x.astype(jnp.float32)
        ty = gt_cy * h - cell_y.astype(jnp.float32)
        aw = anchors_px[a_idx, 0] / img_w
        ah = anchors_px[a_idx, 1] / img_h
        tw = jnp.log(jnp.maximum(gt_w, 1e-9) / jnp.maximum(aw, 1e-9))
        th = jnp.log(jnp.maximum(gt_h, 1e-9) / jnp.maximum(ah, 1e-9))
        box_scale = (2.0 - gt_w * gt_h) * onf  # [B, G]

        pred_xy = jax.nn.sigmoid(pred[..., 0:2])
        loss_xy = jnp.square(pred_xy[..., 0] - tx) + jnp.square(pred_xy[..., 1] - ty)
        loss_wh = jnp.square(pred[..., 2] - tw) + jnp.square(pred[..., 3] - th)
        total_loc = total_loc + coord_weight * jnp.sum((loss_xy + loss_wh) * box_scale)

        cls_t = jax.nn.one_hot(gt_labels, c)
        total_conf = total_conf + class_weight * jnp.sum(
            _bce_logits(pred[..., 5:], cls_t) * onf[..., None]
        )
        # Positive objectness (per GT row; collisions contribute per-GT).
        total_conf = total_conf + jnp.sum(_bce_logits(pred[..., 4], jnp.ones_like(onf)) * onf)

        # --- negative objectness over the dense grid ---
        pos_mask = jnp.zeros((b, k), jnp.bool_).at[batch_idx, flat_idx].max(on_scale)
        boxes_dec, _, _ = decode_scale(raw.astype(jnp.float32), anchors_px, img_hw)
        ious = jaccard(boxes_dec, gt_boxes)  # [B, K, G]
        ious = jnp.where(gt_valid[:, None, :], ious, 0.0)
        best_iou = jnp.max(ious, axis=-1)  # [B, K]
        neg_mask = ~pos_mask & (best_iou <= ignore_threshold)
        obj_bce = _bce_logits(raw_flat[..., 4], jnp.zeros((b, k), jnp.float32))
        total_conf = total_conf + noobj_weight * jnp.sum(obj_bce * neg_mask.astype(jnp.float32))

    denom = jnp.float32(b)
    return total_loc / denom, total_conf / denom


def yolo_v2_loss(
    raw_outputs: Sequence[jnp.ndarray],
    anchors_per_scale: Sequence,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    img_hw: Tuple[int, int],
    *,
    seen_images: jnp.ndarray | float = jnp.inf,
    ignore_threshold: float = 0.6,
    object_scale: float = 5.0,
    noobject_scale: float = 1.0,
    class_scale: float = 1.0,
    coord_scale: float = 1.0,
    prior_scale: float = 0.01,
    prior_seen: float = 12800.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """YOLOv2 (YOLO9000) region loss — darknet ``region_layer`` semantics.

    The reference's v0 YOLO train path was incomplete (SURVEY.md §2.5:
    reference ``lib/modeling/ssds/yolo.py`` ships only the inference graph),
    so this follows the published darknet region layer, which differs from
    the v3 recipe (:func:`yolo_loss`) in every term:

    * single scale, anchors matched per GT by wh-IoU *within that scale*;
    * coordinate loss is MSE on (sigmoid(tx), sigmoid(ty), tw, th) weighted
      ``coord_scale * (2 - w*h)``;
    * objectness is SQUARED error on sigmoid(to) with the positive target
      RESCORED to the actual IoU(pred, gt) (darknet ``rescore=1``), weight
      ``object_scale``; negatives weigh ``noobject_scale`` and are ignored
      above ``ignore_threshold`` (0.6 for v2, vs 0.5 in v3);
    * classification is softmax cross-entropy over classes (the standard
      formulation in v2 reimplementations; darknet's SSE-on-softmax has the
      same argmin);
    * for the first ``prior_seen`` seen images, ALL cells additionally
      regress toward their anchor prior (tx=ty=0.5, tw=th=0) with weight
      ``prior_scale`` — darknet's early-training stabilizer; pass the
      running ``seen_images`` count to enable (default inf = off).

    Args/returns match :func:`yolo_loss` (loc term, conf term, /batch).
    """
    img_h, img_w = img_hw
    b, g = gt_labels.shape
    raw = raw_outputs[0]
    anchors_px = jnp.asarray(anchors_per_scale[0], jnp.float32)  # [A, 2]
    _, h, w, a, ch = raw.shape
    c = ch - 5
    k = h * w * a
    raw_flat = raw.reshape(b, k, ch).astype(jnp.float32)

    gt_w = gt_boxes[..., 2] - gt_boxes[..., 0]
    gt_h = gt_boxes[..., 3] - gt_boxes[..., 1]
    gt_cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2.0
    gt_cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2.0

    # Best anchor per GT by wh-IoU (this scale only).
    gt_wh_px = jnp.stack([gt_w * img_w, gt_h * img_h], axis=-1)  # [B, G, 2]
    inter = jnp.minimum(gt_wh_px[..., None, 0], anchors_px[None, None, :, 0]) * \
        jnp.minimum(gt_wh_px[..., None, 1], anchors_px[None, None, :, 1])
    union = (gt_wh_px[..., 0] * gt_wh_px[..., 1])[..., None] + \
        (anchors_px[:, 0] * anchors_px[:, 1])[None, None, :] - inter
    a_idx = jnp.argmax(inter / jnp.maximum(union, 1e-9), axis=-1)  # [B, G]

    cell_x = jnp.clip((gt_cx * w).astype(jnp.int32), 0, w - 1)
    cell_y = jnp.clip((gt_cy * h).astype(jnp.int32), 0, h - 1)
    flat_idx = (cell_y * w + cell_x) * a + a_idx  # [B, G]
    batch_idx = jnp.arange(b)[:, None]
    onf = gt_valid.astype(jnp.float32)

    pred = raw_flat[batch_idx, flat_idx]  # [B, G, 5+C]
    boxes_dec, _, _ = decode_scale(raw.astype(jnp.float32), anchors_px, img_hw)

    # --- coordinate term (MSE, small-box upweight) ---
    tx = gt_cx * w - cell_x.astype(jnp.float32)
    ty = gt_cy * h - cell_y.astype(jnp.float32)
    aw = anchors_px[a_idx, 0] / img_w
    ah = anchors_px[a_idx, 1] / img_h
    tw = jnp.log(jnp.maximum(gt_w, 1e-9) / jnp.maximum(aw, 1e-9))
    th = jnp.log(jnp.maximum(gt_h, 1e-9) / jnp.maximum(ah, 1e-9))
    pred_xy = jax.nn.sigmoid(pred[..., 0:2])
    coord_se = (jnp.square(pred_xy[..., 0] - tx) + jnp.square(pred_xy[..., 1] - ty)
                + jnp.square(pred[..., 2] - tw) + jnp.square(pred[..., 3] - th))
    box_scale = coord_scale * (2.0 - gt_w * gt_h) * onf
    total_loc = jnp.sum(coord_se * box_scale)

    # --- prior-regression warm-up (all cells -> their anchor) ---
    sig_xy = jax.nn.sigmoid(raw_flat[..., 0:2])
    prior_se = (jnp.square(sig_xy[..., 0] - 0.5) + jnp.square(sig_xy[..., 1] - 0.5)
                + jnp.square(raw_flat[..., 2]) + jnp.square(raw_flat[..., 3]))
    warm = (jnp.asarray(seen_images, jnp.float32) < prior_seen).astype(jnp.float32)
    total_loc = total_loc + warm * prior_scale * jnp.sum(prior_se)

    # --- objectness (squared error on sigmoid, IoU-rescored positives) ---
    sig_obj_all = jax.nn.sigmoid(raw_flat[..., 4])  # [B, K]
    pred_boxes_at_gt = boxes_dec[batch_idx, flat_idx]  # [B, G, 4]
    iou_t = jax.lax.stop_gradient(
        iou_pairwise(pred_boxes_at_gt, gt_boxes))  # [B, G]
    sig_obj_pos = jax.nn.sigmoid(pred[..., 4])
    total_conf = object_scale * jnp.sum(jnp.square(iou_t - sig_obj_pos) * onf)

    pos_mask = jnp.zeros((b, k), jnp.bool_).at[batch_idx, flat_idx].max(gt_valid)
    ious = jaccard(boxes_dec, gt_boxes)  # [B, K, G]
    ious = jnp.where(gt_valid[:, None, :], ious, 0.0)
    neg_mask = ~pos_mask & (jnp.max(ious, axis=-1) <= ignore_threshold)
    total_conf = total_conf + noobject_scale * jnp.sum(
        jnp.square(sig_obj_all) * neg_mask.astype(jnp.float32))

    # --- classification (softmax CE at positive slots) ---
    logp = jax.nn.log_softmax(pred[..., 5:], axis=-1)
    ce = -jnp.take_along_axis(logp, gt_labels[..., None], axis=-1)[..., 0]
    total_conf = total_conf + class_scale * jnp.sum(ce * onf)

    denom = jnp.float32(b)
    return total_loc / denom, total_conf / denom
