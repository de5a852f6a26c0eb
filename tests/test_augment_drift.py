"""Quantify device-aug vs host-aug distribution drift (VERDICT r2 item 6).

``ops/augment_device.py`` is a documented distribution-port of the host
pipeline (``data/augment.py``), approximating the reference's per-GT min-IoU
crop constraint with center-inclusion and HSV hue with per-channel gains.
This test runs BOTH pipelines over the same synthetic corpus with matched
augmentation probability and bounds the drift on the statistics that shape
training quality:

- box survival rate (fraction of GT boxes that remain valid),
- box-center spread (std of surviving normalized centers — how much the
  geometry moves targets around),
- pixel moments (mean/std of the mean-subtracted output images — how much
  the photometric + canvas-fill distributions differ).

Measured values (CPU jax, seed below, N=48 images, 2026-08-17 session):
survival host ~0.80 vs device ~0.87; center-spread host ~0.20 vs device
~0.21; pixel std host ~48 vs device ~45. The asserted bounds leave room for
sampler noise but would catch a broken gate (e.g. aug never firing, flip
always on, photometric applied twice).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssds_tpu.data.augment import preproc
from ssds_tpu.ops.augment_device import augment_batch

SIZE = 96
MEANS = (104, 117, 123)
PROB = 0.6
N_IMG = 48
G = 4  # boxes per image


def _corpus(rng):
    """Synthetic images with drawn rectangles + their GT boxes (pixel)."""
    imgs, boxes = [], []
    for _ in range(N_IMG):
        img = rng.integers(40, 216, (SIZE, SIZE, 3), dtype=np.uint8)
        bx = []
        for _ in range(G):
            x1, y1 = rng.integers(4, SIZE // 2, 2)
            w, h = rng.integers(12, SIZE // 2, 2)
            x2, y2 = min(x1 + w, SIZE - 2), min(y1 + h, SIZE - 2)
            img[y1:y2, x1:x2] = rng.integers(0, 255, 3)
            bx.append([x1, y1, x2, y2])
        imgs.append(img)
        boxes.append(np.asarray(bx, np.float32))
    return imgs, boxes


def _host_stats(imgs, boxes):
    p = preproc((SIZE, SIZE), MEANS, PROB)
    survived, centers, pix = 0, [], []
    total = N_IMG * G
    for img, bx in zip(imgs, boxes):
        targets = np.hstack([bx, np.ones((len(bx), 1), np.float32)])
        out_img, out_t = p(img, targets)
        survived += len(out_t)
        centers.append((out_t[:, 0:2] + out_t[:, 2:4]) / 2)
        pix.append(out_img.astype(np.float32) - np.asarray(MEANS, np.float32))
    pix = np.stack(pix)
    centers = np.concatenate(centers)
    return survived / total, centers.std(), pix.mean(), pix.std()


def _device_stats(imgs, boxes):
    images = jnp.asarray(np.stack(imgs), jnp.float32) - jnp.asarray(MEANS)
    bx = jnp.asarray(np.stack(boxes)) / SIZE
    valid = jnp.ones((N_IMG, G), bool)
    out_img, out_bx, out_vd = jax.jit(augment_batch, static_argnames="prob")(
        jax.random.PRNGKey(0), images, bx, valid, prob=PROB)
    out_img, out_bx, out_vd = map(np.asarray, (out_img, out_bx, out_vd))
    centers = ((out_bx[:, :, 0:2] + out_bx[:, :, 2:4]) / 2)[out_vd]
    return out_vd.mean(), centers.std(), out_img.mean(), out_img.std()


def test_device_vs_host_distribution_drift():
    rng = np.random.default_rng(42)
    imgs, boxes = _corpus(rng)
    np.random.seed(7)  # host pipeline uses global random/np.random
    import random as pyrandom
    pyrandom.seed(7)

    h_surv, h_spread, h_mean, h_std = _host_stats(imgs, boxes)
    d_surv, d_spread, d_mean, d_std = _device_stats(imgs, boxes)
    print(f"survival host={h_surv:.3f} dev={d_surv:.3f}; "
          f"center-spread host={h_spread:.3f} dev={d_spread:.3f}; "
          f"pixel mean host={h_mean:.1f} dev={d_mean:.1f}; "
          f"pixel std host={h_std:.1f} dev={d_std:.1f}")

    # box survival: both pipelines keep most boxes; drift bounded
    assert abs(h_surv - d_surv) < 0.2, (h_surv, d_surv)
    assert h_surv > 0.5 and d_surv > 0.5
    # geometric spread of surviving centers within 35% of each other
    assert abs(h_spread - d_spread) / max(h_spread, d_spread) < 0.35
    # photometric + canvas fill: moments in the same regime
    assert abs(h_mean - d_mean) < 25.0
    assert abs(h_std - d_std) / max(h_std, d_std) < 0.25
