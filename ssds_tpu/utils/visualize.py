"""TensorBoard visualization helpers.

Behavioral spec source: reference ``lib/utils/visualize_utils.py`` (SURVEY.md
§2.7): prior-box overlays, augmented-sample grids, per-module feature-map
grids, gradient histograms — eyeball-driven verification of the pipeline.
"""

from __future__ import annotations

import numpy as np


def _to_chw_uint8(img_hwc_bgr: np.ndarray) -> np.ndarray:
    """float BGR HWC (mean-subtracted) -> uint8 RGB CHW for tensorboardX."""
    img = img_hwc_bgr.astype(np.float32)
    img = img - img.min()
    if img.max() > 0:
        img = img / img.max()
    img = (img * 255).astype(np.uint8)
    return img[:, :, ::-1].transpose(2, 0, 1)


def draw_boxes(image_hwc: np.ndarray, boxes_norm: np.ndarray, color=(0, 255, 0)) -> np.ndarray:
    """Draw normalized corner boxes onto an HWC image (cv2)."""
    import cv2

    img = np.ascontiguousarray(image_hwc.copy())
    h, w = img.shape[:2]
    for b in np.asarray(boxes_norm).reshape(-1, 4):
        p1 = (int(b[0] * w), int(b[1] * h))
        p2 = (int(b[2] * w), int(b[3] * h))
        cv2.rectangle(img, p1, p2, color, 1)
    return img


def viz_prior_box(writer, priors: np.ndarray, image_size, epoch: int = 0, max_cells=3):
    """Render a few cells' anchors over a blank canvas (reference
    ``viz_prior_box``)."""
    h, w = int(image_size[0]), int(image_size[1])
    canvas = np.full((h, w, 3), 255, np.uint8)
    # center-form -> corner-form for a few center-ish priors
    centers = priors[:, :2]
    mid = np.array([0.5, 0.5])
    order = np.argsort(np.sum((centers - mid) ** 2, axis=1))[: max_cells * 8]
    sel = priors[order]
    corners = np.concatenate([sel[:, :2] - sel[:, 2:] / 2, sel[:, :2] + sel[:, 2:] / 2], axis=1)
    img = draw_boxes(canvas, corners, color=(255, 0, 0))
    writer.add_image("priors/center_cells", _to_chw_uint8(img.astype(np.float32)), epoch)


def viz_samples(writer, loader, epoch: int = 0, max_images: int = 8):
    """Log a grid of (augmented) training samples with their GT boxes."""
    for batch in loader:
        n = min(max_images, batch["images"].shape[0])
        for i in range(n):
            img = batch["images"][i]
            boxes = batch["boxes"][i][batch["valid"][i]]
            img = draw_boxes(img, boxes)
            writer.add_image(f"samples/{i}", _to_chw_uint8(img), epoch)
        break


def viz_feature_maps(writer, feature_maps, epoch: int = 0, tag: str = "features"):
    """Per-level mean-activation heatmaps (reference
    ``viz_module_feature_maps``)."""
    for k, fm in enumerate(feature_maps):
        m = np.asarray(fm[0]).mean(axis=-1)  # [H, W]
        m = m - m.min()
        if m.max() > 0:
            m = m / m.max()
        writer.add_image(f"{tag}/level{k}", (m[None] * 255).astype(np.uint8), epoch)


def viz_grads(writer, grads_flat: dict, epoch: int = 0):
    """Gradient histograms per parameter (reference ``viz_module_grads``)."""
    for path, g in grads_flat.items():
        writer.add_histogram("grads/" + "/".join(map(str, path)), np.asarray(g), epoch)
