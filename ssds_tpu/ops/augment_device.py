"""Batched ON-DEVICE augmentation — the TPU-native alternative host pipeline.

SURVEY.md §2.9 names "batched on-device augmentation (resize/crop/flip/color
in jnp)" as the native equivalent of the reference's per-sample cv2 pipeline
(``lib/utils/data_augment.py``). This module implements it: the host loader
does decode+resize only (cheap, ~0.7 ms/sample) and every random transform
runs inside the jitted train step on the TPU — the right trade when host
cores are scarce relative to chip throughput.

Round-5 rewrite (VERDICT r4 #3): the first version approximated the host
recipe (hue -> tiny channel gains, single-scale affine, no IoU constraint,
photometric on mean-subtracted values without saturation) and MEASURABLY
under-trained — 0.833 vs 0.9995 host mAP on the 5-class CLI oracle
(tools/aug_map_parity.py). This version ports the host distribution
faithfully; every delta from the reference recipe is listed:

- **Gating** matches ``data/augment.py preproc.__call__``: ONE coin
  (``U < prob``) selects the augmented branch; inside it crop (mode drawn
  from {None, 0.1, 0.3, 0.5, 0.7, 0.9} min-IoU), photometric, mirror (1/2),
  and expand (``U < prob``) apply in the host's roles. Outside it the image
  passes through untouched (no flip, no photometric — as on host).
- **Crop** is candidate-select instead of retry-loop: K=16 candidate ROIs
  with the host's scale/aspect law (scale U[0.3,1], ratio
  sqrt(U[max(.5,s^2), min(2,1/s^2)]) — per-axis aspect jitter included);
  the first candidate whose min-over-GT IoU clears the drawn threshold AND
  contains >=1 GT center wins; none -> no crop (the host's ``while True``
  re-draws the mode instead, slightly amplifying no-crop on hard images).
- **Expand** samples the host's canvas law (scale U[1,4], same ratio
  bounds, uniform placement). Crop and expand COMPOSE into one per-axis
  affine, applied once with ``jax.image.scale_and_translate`` on
  mean-subtracted pixels so the zero fill equals the host's mean fill
  (which the host never photometrically distorts — hence photometric runs
  BEFORE the affine here; pointwise ops commute with resampling up to
  clipping interactions at bilinear edges).
- **Photometric** runs on RAW [0,255] values with cv2's saturation clip
  after every op (brightness +-32, contrast x[0.5,1.5], saturation via
  luma-mix x[0.5,1.5], hue = gray-axis rotation by U[-36deg,36deg] — the
  RGB-space equivalent of the host's uint8-HSV +-18/180 rotation; it
  preserves the gray axis exactly and luma approximately).
- Boxes: per-axis affine, center-inside-canvas keep rule (== the host's
  center-in-ROI: expand never evicts), clip, and the host's final
  degenerate-box drop (min side <= 0.005). Empty-survivor images fall back
  to the unaugmented original (host empty-target guard).

Returns transformed images plus adjusted (boxes, valid) — labels unchanged.
Equivalence is enforced at the mAP level by tools/aug_map_parity.py /
tests/test_device_aug_map_parity.py and at the distribution level by
tests/test_augment_drift.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

N_CROP_CANDIDATES = 16
# the host's crop-mode menu: None (no crop) + 5 min-IoU thresholds
_CROP_MIN_IOUS = (-1.0, 0.1, 0.3, 0.5, 0.7, 0.9)  # -1 == mode None


def _ratio_bounds(scale):
    return (jnp.maximum(0.5, scale * scale),
            jnp.minimum(2.0, 1.0 / (scale * scale)))


def _sample_crop(key, boxes, valid):
    """Candidate-select IoU-constrained crop (host ``_crop``).

    Returns per-axis normalized affine ``(ax, ay, bx, by)`` with
    ``n_out = a * n_in + b`` (identity when mode is None or no candidate
    passes).
    """
    km, ks, kr, kx, ky = jax.random.split(key, 5)
    min_iou = jnp.asarray(_CROP_MIN_IOUS)[
        jax.random.randint(km, (), 0, len(_CROP_MIN_IOUS))]

    k = N_CROP_CANDIDATES
    scale = jax.random.uniform(ks, (k,), minval=0.3, maxval=1.0)
    lo, hi = _ratio_bounds(scale)
    ratio = jnp.sqrt(jax.random.uniform(kr, (k,), minval=lo, maxval=hi))
    rw = scale * ratio
    rh = scale / ratio
    rx = jax.random.uniform(kx, (k,)) * (1.0 - rw)
    ry = jax.random.uniform(ky, (k,)) * (1.0 - rh)
    roi = jnp.stack([rx, ry, rx + rw, ry + rh], axis=1)  # [K, 4]

    # IoU(GT, ROI) in normalized coords — scale-invariant == host pixels
    lt = jnp.maximum(boxes[:, None, :2], roi[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], roi[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_b = jnp.prod(jnp.clip(boxes[:, 2:] - boxes[:, :2], 0, None), axis=1)
    area_r = rw * rh
    iou = inter / jnp.maximum(area_b[:, None] + area_r[None, :] - inter, 1e-12)
    # host constraint: min over ALL GT >= min_iou (max side is +inf)
    iou_min = jnp.min(jnp.where(valid[:, None], iou, jnp.inf), axis=0)  # [K]

    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    inside = ((roi[None, :, 0] < centers[:, None, 0])
              & (centers[:, None, 0] < roi[None, :, 2])
              & (roi[None, :, 1] < centers[:, None, 1])
              & (centers[:, None, 1] < roi[None, :, 3]))  # [G, K]
    any_center = jnp.any(inside & valid[:, None], axis=0)  # [K]

    passing = (iou_min >= min_iou) & any_center & jnp.any(valid)
    chosen = jnp.argmax(passing)  # first passing candidate
    do_crop = jnp.any(passing) & (min_iou >= 0.0)

    ax = jnp.where(do_crop, 1.0 / rw[chosen], 1.0)
    ay = jnp.where(do_crop, 1.0 / rh[chosen], 1.0)
    bx = jnp.where(do_crop, -rx[chosen] / rw[chosen], 0.0)
    by = jnp.where(do_crop, -ry[chosen] / rh[chosen], 0.0)
    return ax, ay, bx, by


def _sample_expand(key, prob):
    """Zoom-out canvas affine (host ``_expand``): per-axis normalized
    ``(ax, ay, bx, by)``; identity with probability ``1 - prob``."""
    kg, ks, kr, kx, ky = jax.random.split(key, 5)
    do = jax.random.uniform(kg) < prob
    scale = jax.random.uniform(ks, minval=1.0, maxval=4.0)
    lo = jnp.maximum(0.5, 1.0 / (scale * scale))
    hi = jnp.minimum(2.0, scale * scale)
    ratio = jnp.sqrt(jax.random.uniform(kr, minval=lo, maxval=hi))
    ws = scale * ratio   # >= 1 by the ratio bounds
    hs = scale / ratio   # >= 1
    left = jax.random.uniform(kx) * (ws - 1.0)  # canvas-units offset
    top = jax.random.uniform(ky) * (hs - 1.0)
    ax = jnp.where(do, 1.0 / ws, 1.0)
    ay = jnp.where(do, 1.0 / hs, 1.0)
    bx = jnp.where(do, left / ws, 0.0)
    by = jnp.where(do, top / hs, 0.0)
    return ax, ay, bx, by


def _apply_affine_image(img, ax, ay, bx, by):
    h, w = img.shape[0], img.shape[1]
    return jax.image.scale_and_translate(
        img, img.shape, (0, 1),
        jnp.stack([ay, ax]), jnp.stack([by * h, bx * w]),
        method="linear",
    )


def _apply_affine_boxes(boxes, valid, ax, ay, bx, by):
    """Per-axis normalized affine on corner boxes; drop boxes whose centers
    leave the canvas; clip survivors; drop degenerates (host 0.005 rule)."""
    out = jnp.stack([
        boxes[:, 0] * ax + bx, boxes[:, 1] * ay + by,
        boxes[:, 2] * ax + bx, boxes[:, 3] * ay + by,
    ], axis=1)
    cx = (out[:, 0] + out[:, 2]) / 2
    cy = (out[:, 1] + out[:, 3]) / 2
    inside = (cx > 0) & (cx < 1) & (cy > 0) & (cy < 1)
    out = jnp.clip(out, 0.0, 1.0)
    min_side = jnp.minimum(out[:, 2] - out[:, 0], out[:, 3] - out[:, 1])
    return out, valid & inside & (min_side > 0.005)


def _photometric(key, img_raw):
    """Host ``_distort`` on RAW [0,255] values, cv2-saturating after every
    op. Each gate and magnitude gets its OWN subkey (ADVICE r1: a shared
    key correlates the gate with the magnitude and silently halves the
    distribution)."""
    kb, kbm, kc, kcm, ks, ksm, kh, khm = jax.random.split(key, 8)
    img = img_raw
    img = jnp.where(
        jax.random.bernoulli(kb),
        jnp.clip(img + jax.random.uniform(kbm, minval=-32.0, maxval=32.0),
                 0.0, 255.0), img)
    img = jnp.where(
        jax.random.bernoulli(kc),
        jnp.clip(img * jax.random.uniform(kcm, minval=0.5, maxval=1.5),
                 0.0, 255.0), img)
    luma = jnp.mean(img, axis=-1, keepdims=True)
    sat = jax.random.uniform(ksm, minval=0.5, maxval=1.5)
    img = jnp.where(jax.random.bernoulli(ks),
                    jnp.clip(luma + (img - luma) * sat, 0.0, 255.0), img)
    # hue: rotate about the gray axis by theta ~ U[-36deg, 36deg] (the host
    # shifts uint8 hue by U{-18..18} of 180 == +-36deg). Exact on the gray
    # axis, luma-preserving to first order; sign symmetry makes the BGR/RGB
    # channel order irrelevant.
    theta = jax.random.uniform(khm, minval=-36.0, maxval=36.0) * (jnp.pi / 180.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    k = (1.0 - c) / 3.0
    sq = s / jnp.sqrt(3.0)
    rot = jnp.stack([
        jnp.stack([c + k, k - sq, k + sq]),
        jnp.stack([k + sq, c + k, k - sq]),
        jnp.stack([k - sq, k + sq, c + k]),
    ])
    img = jnp.where(jax.random.bernoulli(kh),
                    jnp.clip(img @ rot.T, 0.0, 255.0), img)
    return img


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    prob: float = 0.6,
    means: Tuple[float, float, float] = (104.0, 117.0, 123.0),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the host augmentation recipe to a whole batch on device.

    Args:
      rng: PRNG key (fold in the step counter per iteration).
      images: ``[B, H, W, 3]`` float32, ALREADY mean-subtracted (zero padding
        from geometric transforms then equals mean fill).
      boxes: ``[B, G, 4]`` normalized corner boxes (zero-padded rows).
      valid: ``[B, G]`` bool.
      prob: cfg.DATASET.PROB — the host's augmentation probability.
      means: cfg.DATASET.PIXEL_MEANS — used to round-trip the photometric
        ops through RAW [0,255] space so cv2's saturation semantics hold.

    Returns:
      (images, boxes, valid) transformed; rows whose centers left the canvas
      or degenerated are invalidated. Images whose augmentation would
      invalidate ALL boxes fall back to the unaugmented original (the
      reference's empty-target guard).
    """
    means_v = jnp.asarray(means, jnp.float32)

    def per_image(key, img, bx, vd):
        kg_branch, kc, ke, kf, kp = jax.random.split(key, 5)
        do_aug = jax.random.uniform(kg_branch) < prob

        # photometric FIRST, on raw values (the affine's mean fill stays
        # undistorted, as on host where distort precedes expand)
        img_out = jnp.where(do_aug, _photometric(kp, img + means_v) - means_v,
                            img)

        # crop THEN expand, composed into one per-axis affine
        cax, cay, cbx, cby = _sample_crop(kc, bx, vd)
        eax, eay, ebx, eby = _sample_expand(ke, prob)
        ax, ay = cax * eax, cay * eay
        abx, aby = cbx * eax + ebx, cby * eay + eby
        identity = (~do_aug)
        ax = jnp.where(identity, 1.0, ax)
        ay = jnp.where(identity, 1.0, ay)
        abx = jnp.where(identity, 0.0, abx)
        aby = jnp.where(identity, 0.0, aby)

        new_img = _apply_affine_image(img_out, ax, ay, abx, aby)
        new_bx, new_vd = _apply_affine_boxes(bx, vd, ax, ay, abx, aby)
        # empty-target guard: unaugmented original when no box survives
        keep_aug = ~(jnp.any(vd) & ~jnp.any(new_vd))
        img_out = jnp.where(keep_aug, new_img, img)
        bx_out = jnp.where(keep_aug, new_bx, bx)
        vd_out = jnp.where(keep_aug, new_vd, vd)

        # horizontal flip, inside the augmented branch (host mirrors only
        # augmented samples) and also applied to the empty-guard fallback
        # (host order: crop -> distort -> MIRROR -> expand; its fallback
        # skips mirror too, so gate on keep_aug as well)
        do_flip = jax.random.bernoulli(kf) & do_aug & keep_aug
        img_out = jnp.where(do_flip, img_out[:, ::-1, :], img_out)
        flipped = jnp.stack([
            1.0 - bx_out[:, 2], bx_out[:, 1], 1.0 - bx_out[:, 0], bx_out[:, 3],
        ], axis=1)
        bx_out = jnp.where(do_flip, flipped, bx_out)
        return img_out, bx_out, vd_out

    b = images.shape[0]
    keys = jax.random.split(rng, b)
    return jax.vmap(per_image)(keys, images.astype(jnp.float32), boxes, valid)
