"""Batched ON-DEVICE augmentation — the TPU-native alternative host pipeline.

SURVEY.md §2.9 names "batched on-device augmentation (resize/crop/flip/color
in jnp)" as the native equivalent of the reference's per-sample cv2 pipeline
(``lib/utils/data_augment.py``). This module implements it: the host loader
does decode+resize only (cheap, ~0.7 ms/sample) and every random transform
runs inside the jitted train step on the TPU — the right trade when host
cores are scarce relative to chip throughput.

Design (all static shapes, one fused XLA program, vmapped over the batch):

- **Geometric**: one affine zoom per image — zoom-OUT (the reference's
  ``_expand``: scale 1/4..1, mean fill) or zoom-IN (the reference's
  ``_crop``: scale 1..1/0.3) — applied with ``jax.image.scale_and_translate``
  AFTER mean subtraction, so the zero padding outside the source equals the
  reference's mean-filled canvas. Crop candidates that would leave no GT
  center inside fall back to identity per image (the reference's retry loop,
  collapsed to candidate-select). The reference's per-GT min-IoU constraint
  is approximated by the center-inclusion rule (SURVEY.md §7: port the
  *distribution*, verify via mAP, not bitwise).
- **Horizontal flip** with probability 1/2 (reference ``_mirror``).
- **Photometric** (reference ``_distort``, RGB approximation of the HSV
  recipe): brightness shift ±32, contrast 0.5–1.5, saturation 0.5–1.5 via
  mix-with-luma; hue rotation is approximated by small random per-channel
  gains (the mAP-relevant distortions are brightness/contrast/saturation).

Returns transformed images plus adjusted (boxes, valid) — labels unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _affine_params(key, h, w, prob):
    """Sample per-image zoom parameters: returns (scale, tx, ty) in OUTPUT
    pixels such that out(x) = in(x/scale - t) via scale_and_translate."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    mode = jax.random.uniform(k1)  # [0,1): <1/3 identity, <2/3 out, else in
    do_aug = jax.random.uniform(k2) < prob

    # zoom-out: image occupies scale∈[0.25,1] of the canvas
    s_out = jax.random.uniform(k3, minval=0.25, maxval=1.0)
    # zoom-in: magnify by 1/scale with scale∈[0.3,1] (the crop ROI size)
    s_in = 1.0 / jax.random.uniform(k3, minval=0.3, maxval=1.0)

    scale = jnp.where(mode < 1.0 / 3.0, 1.0, jnp.where(mode < 2.0 / 3.0, s_out, s_in))
    scale = jnp.where(do_aug, scale, 1.0)
    # translation keeps the scaled image covering/inside the canvas
    max_tx = jnp.abs(w * (1.0 - scale))
    max_ty = jnp.abs(h * (1.0 - scale))
    sign = jnp.where(scale <= 1.0, 1.0, -1.0)
    tx = sign * jax.random.uniform(k4) * max_tx
    ty = sign * jax.random.uniform(k5) * max_ty
    tx = jnp.where(do_aug, tx, 0.0)
    ty = jnp.where(do_aug, ty, 0.0)
    return scale, tx, ty


def _apply_affine_image(img, scale, tx, ty):
    h, w = img.shape[0], img.shape[1]
    return jax.image.scale_and_translate(
        img, img.shape, (0, 1),
        jnp.stack([scale, scale]), jnp.stack([ty, tx]),
        method="linear",
    )


def _apply_affine_boxes(boxes, valid, scale, tx, ty, h, w):
    """Map normalized corner boxes through the affine; drop boxes whose
    centers leave the canvas; clip survivors."""
    sx = scale
    bx = boxes * jnp.array([w, h, w, h])  # to pixels
    out = jnp.stack([
        bx[:, 0] * sx + tx, bx[:, 1] * sx + ty,
        bx[:, 2] * sx + tx, bx[:, 3] * sx + ty,
    ], axis=1)
    cx = (out[:, 0] + out[:, 2]) / 2
    cy = (out[:, 1] + out[:, 3]) / 2
    inside = (cx > 0) & (cx < w) & (cy > 0) & (cy < h)
    out = jnp.stack([
        jnp.clip(out[:, 0], 0, w), jnp.clip(out[:, 1], 0, h),
        jnp.clip(out[:, 2], 0, w), jnp.clip(out[:, 3], 0, h),
    ], axis=1) / jnp.array([w, h, w, h])
    return out, valid & inside


def _photometric(key, img):
    """Brightness/contrast/saturation/channel jitter on mean-subtracted RGB.

    Each gate and each magnitude draw gets its OWN subkey: with a shared key,
    ``bernoulli(k) == uniform(k) < 0.5``, so a gate firing would imply the
    magnitude landed in the lower half of its range (e.g. brightness only
    ever shifting negative) — a silent halving of the distribution.
    """
    kg1, km1, kg2, km2, kg3, km3, kg4, km4 = jax.random.split(key, 8)
    img = img + jnp.where(jax.random.bernoulli(kg1),
                          jax.random.uniform(km1, minval=-32.0, maxval=32.0), 0.0)
    img = img * jnp.where(jax.random.bernoulli(kg2),
                          jax.random.uniform(km2, minval=0.5, maxval=1.5), 1.0)
    luma = jnp.mean(img, axis=-1, keepdims=True)
    sat = jnp.where(jax.random.bernoulli(kg3),
                    jax.random.uniform(km3, minval=0.5, maxval=1.5), 1.0)
    img = luma + (img - luma) * sat
    gains = jnp.where(jax.random.bernoulli(kg4),
                      jax.random.uniform(km4, (3,), minval=0.9, maxval=1.1), 1.0)
    return img * gains


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    prob: float = 0.6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the augmentation recipe to a whole batch on device.

    Args:
      rng: PRNG key (fold in the step counter per iteration).
      images: ``[B, H, W, 3]`` float32, ALREADY mean-subtracted (zero padding
        from geometric transforms then equals mean fill).
      boxes: ``[B, G, 4]`` normalized corner boxes (zero-padded rows).
      valid: ``[B, G]`` bool.

    Returns:
      (images, boxes, valid) transformed; rows whose centers left the canvas
      are invalidated. Images whose augmentation would invalidate ALL boxes
      fall back to identity (the reference's empty-target guard).
    """
    b, h, w, _ = images.shape

    def per_image(key, img, bx, vd):
        kg, kf, kp = jax.random.split(key, 3)
        scale, tx, ty = _affine_params(kg, h, w, prob)
        new_img = _apply_affine_image(img, scale, tx, ty)
        new_bx, new_vd = _apply_affine_boxes(bx, vd, scale, tx, ty, h, w)
        # empty-target guard: identity when no box survives (and any existed)
        keep_aug = ~(jnp.any(vd) & ~jnp.any(new_vd))
        img_out = jnp.where(keep_aug, new_img, img)
        bx_out = jnp.where(keep_aug, new_bx, bx)
        vd_out = jnp.where(keep_aug, new_vd, vd)

        # horizontal flip
        do_flip = jax.random.bernoulli(kf)
        img_out = jnp.where(do_flip, img_out[:, ::-1, :], img_out)
        flipped = jnp.stack([
            1.0 - bx_out[:, 2], bx_out[:, 1], 1.0 - bx_out[:, 0], bx_out[:, 3],
        ], axis=1)
        bx_out = jnp.where(do_flip, flipped, bx_out)

        kp_gate, kp_draw = jax.random.split(kp)
        do_photo = jax.random.uniform(kp_gate) < prob
        img_out = jnp.where(do_photo, _photometric(kp_draw, img_out), img_out)
        return img_out, bx_out, vd_out

    keys = jax.random.split(rng, b)
    return jax.vmap(per_image)(keys, images.astype(jnp.float32), boxes, valid)
