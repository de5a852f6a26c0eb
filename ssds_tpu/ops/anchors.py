"""Vectorized prior-box (anchor) generation.

Behavioral spec source: reference ``lib/layers/functions/prior_box.py``
(SURVEY.md §2.4): for each feature map k of size ``(H_k, W_k)`` and each cell
``(i, j)``::

    cx = (j + 0.5) * step_k / W_img ;  cy = (i + 0.5) * step_k / H_img

and per cell, in order:

1. the min-size square (scale ``s_k``),
2. the geometric-mean square ``sqrt(s_k * s_{k+1})``,
3. for each aspect ratio ``ar``: ``(s_k*sqrt(ar), s_k/sqrt(ar))`` followed by
   its reciprocal ``(s_k/sqrt(ar), s_k*sqrt(ar))``.

Output is ``[sum_k H_k*W_k*A_k, 4]`` in center form ``(cx, cy, w, h)``,
normalized to [0,1], clipped when ``clip=True``. Cell order is row-major
(``i`` outer, ``j`` inner) then anchor index — this matches the NHWC
``[B,H,W,A*4] -> [B,H*W*A,4]`` reshape of the head outputs.

TPU-first design: the reference loops ``itertools.product`` in Python per
forward-construction; here the whole anchor set is computed once in numpy at
model-build time and embedded as a jit-time constant.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Static description of the anchor set for one model config.

    ``sizes``: either ``[s_min, s_max]`` scale fractions (interpolated into
    ``num_maps + 1`` scales, as the reference does when ``len(SIZES) == 2``)
    or an explicit per-map list of ``num_maps + 1`` scale fractions.
    ``aspect_ratios``: one list of ratios per feature map (ratio > 1; each
    implies its reciprocal too).
    ``steps``: per-map anchor stride in pixels; empty -> auto
    ``image_size / feature_map_size`` (reference PriorBox default).
    """

    image_size: tuple  # (H, W)
    feature_maps: tuple  # ((H_k, W_k), ...)
    aspect_ratios: tuple  # ((2,), (2, 3), ...)
    sizes: tuple  # (s_min, s_max) or per-map scales, len = num_maps + 1
    steps: tuple = ()  # per-map (step_h, step_w) or scalar; empty = auto
    clip: bool = True


def _resolve_scales(cfg: AnchorConfig) -> np.ndarray:
    """Per-map scale fractions, ``num_maps + 1`` entries."""
    m = len(cfg.feature_maps)
    sizes = list(cfg.sizes)
    if len(sizes) == 2 and m != 1:
        s_min, s_max = sizes
        # Reference semantics: linearly interpolate num_maps + 1 scales.
        return np.linspace(s_min, s_max, m + 1)
    if len(sizes) == m + 1:
        return np.asarray(sizes, dtype=np.float64)
    raise ValueError(
        f"SIZES must be [s_min, s_max] or have num_maps+1={m + 1} entries; got {sizes}"
    )


def num_anchors_per_cell(aspect_ratios: Sequence[Sequence[float]]) -> list:
    """Anchors per cell for each map: 2 squares + 2 per aspect ratio.

    This is the ``mbox`` list the reference derives from ASPECT_RATIOS and
    feeds to the head builders (SURVEY.md §2.5 wiring contract).
    """
    return [2 + 2 * len(ars) for ars in aspect_ratios]


def generate_anchors(cfg: AnchorConfig) -> np.ndarray:
    """Generate the full anchor set as a float32 ``[K, 4]`` center-form array."""
    img_h, img_w = cfg.image_size
    scales = _resolve_scales(cfg)
    all_anchors = []
    for k, (fh, fw) in enumerate(cfg.feature_maps):
        if cfg.steps:
            step = cfg.steps[k]
            step_h, step_w = (step, step) if np.isscalar(step) else (step[0], step[1])
        else:
            step_h, step_w = img_h / fh, img_w / fw

        s_k = scales[k]
        s_prime = math.sqrt(scales[k] * scales[k + 1])
        whs = [(s_k, s_k), (s_prime, s_prime)]
        for ar in cfg.aspect_ratios[k]:
            r = math.sqrt(ar)
            whs.append((s_k * r, s_k / r))
            whs.append((s_k / r, s_k * r))
        whs = np.asarray(whs, dtype=np.float64)  # [A, 2] (w, h)

        jj, ii = np.meshgrid(np.arange(fw), np.arange(fh))  # [fh, fw] each
        cx = (jj + 0.5) * step_w / img_w
        cy = (ii + 0.5) * step_h / img_h
        centers = np.stack([cx, cy], axis=-1).reshape(fh * fw, 1, 2)  # row-major
        a = whs.shape[0]
        anchors = np.concatenate(
            [np.broadcast_to(centers, (fh * fw, a, 2)), np.broadcast_to(whs, (fh * fw, a, 2))],
            axis=-1,
        ).reshape(-1, 4)
        all_anchors.append(anchors)

    out = np.concatenate(all_anchors, axis=0).astype(np.float32)
    if cfg.clip:
        out = np.clip(out, 0.0, 1.0)
    return out
