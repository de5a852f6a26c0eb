"""On-device batched augmentation: geometry/box consistency properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssds_tpu.ops.augment_device import augment_batch

# Model-building / training tests: minutes each on the 1-vCPU CPU backend.
# `pytest -m 'not slow'` is the fast numerics/config/data verification path.
pytestmark = __import__("pytest").mark.slow


def planted_batch(b=6, h=96, w=96):
    """Gray images with one bright square each, box exactly around it."""
    rng = np.random.default_rng(0)
    images = np.zeros((b, h, w, 3), np.float32)  # mean-subtracted: 0 = mean
    boxes = np.zeros((b, 4, 4), np.float32)
    valid = np.zeros((b, 4), bool)
    for i in range(b):
        x1, y1 = rng.uniform(0.1, 0.4, 2)
        bw, bh = rng.uniform(0.25, 0.4, 2)
        x2, y2 = min(x1 + bw, 0.95), min(y1 + bh, 0.95)
        px = (np.array([x1, y1, x2, y2]) * [w, h, w, h]).astype(int)
        images[i, px[1]:px[3], px[0]:px[2], :] = 100.0
        boxes[i, 0] = [x1, y1, x2, y2]
        valid[i, 0] = True
    return jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid)


def test_prob_zero_is_exact_identity():
    """prob=0 must pass everything through untouched — the host mirrors and
    distorts only INSIDE the augmented branch (round-5 parity rewrite)."""
    images, boxes, valid = planted_batch()
    out_img, out_box, out_valid = augment_batch(
        jax.random.PRNGKey(0), images, boxes, valid, prob=0.0)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(images), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_box), np.asarray(boxes), atol=1e-6)
    assert bool(jnp.all(out_valid == valid))


def test_boxes_track_bright_region():
    """For every augmented image with a surviving box, the bright mass
    centroid must lie inside the (slightly padded) box."""
    images, boxes, valid = planted_batch()
    h, w = images.shape[1:3]
    hits = 0
    for seed in range(10):
        out_img, out_box, out_valid = augment_batch(
            jax.random.PRNGKey(seed), images, boxes, valid, prob=1.0)
        out_img = np.asarray(out_img)
        out_box = np.asarray(out_box)
        out_valid = np.asarray(out_valid)
        for i in range(images.shape[0]):
            if not out_valid[i, 0]:
                continue
            mass = out_img[i].sum(-1)
            # photometric shifts the ORIGINAL background away from the
            # affine's mean fill (host semantics: distort precedes expand),
            # so two background levels exist. The planted square stays the
            # brightest region (contrast >= 0.5 keeps >= +50 over its own
            # background; hue rotation preserves channel sums): isolate it
            # by thresholding midway between the median and the max.
            thr = (np.median(mass) + mass.max()) / 2
            mass = np.where(mass > thr, mass - thr, 0.0)
            total = mass.sum()
            if total < 1e3:  # bright square zoomed out of view
                continue
            ys, xs = np.mgrid[0:h, 0:w]
            cx = float((xs * mass).sum() / total) / w
            cy = float((ys * mass).sum() / total) / h
            bx = out_box[i, 0]
            assert bx[0] - 0.06 <= cx <= bx[2] + 0.06, (seed, i, bx, cx, cy)
            assert bx[1] - 0.06 <= cy <= bx[3] + 0.06, (seed, i, bx, cx, cy)
            hits += 1
    assert hits > 20  # plenty of surviving augmented samples checked


def test_boxes_stay_normalized_and_wellformed():
    images, boxes, valid = planted_batch()
    for seed in range(6):
        _, out_box, out_valid = augment_batch(
            jax.random.PRNGKey(seed), images, boxes, valid, prob=1.0)
        ob = np.asarray(out_box)
        assert (ob >= -1e-5).all() and (ob <= 1 + 1e-5).all()
        v = np.asarray(out_valid)
        kept = ob[v]
        assert (kept[:, 2] >= kept[:, 0]).all()
        assert (kept[:, 3] >= kept[:, 1]).all()


def test_photometric_brightness_is_two_sided():
    """Regression (ADVICE round-1 medium): with a shared key, the bernoulli
    gate and the uniform magnitude were correlated, so brightness shifts were
    only ever negative. Both signs must occur with roughly equal frequency.
    _photometric now works on RAW [0,255] values; a mid-gray image keeps
    both shift signs observable through the saturation clip."""
    from ssds_tpu.ops.augment_device import _photometric

    img = jnp.full((4, 4, 3), 128.0, jnp.float32)
    shifts = []
    for seed in range(200):
        out = _photometric(jax.random.PRNGKey(seed), img)
        m = float(np.asarray(out).mean()) - 128.0
        if abs(m) > 1e-4:
            shifts.append(m)
    pos = sum(1 for s in shifts if s > 0)
    assert len(shifts) > 60
    assert 0.3 < pos / len(shifts) < 0.7, f"{pos}/{len(shifts)} positive"


def test_photometric_stays_in_gamut_and_hue_preserves_channel_sum():
    """cv2-parity saturation: outputs clip to [0,255]; the gray-axis hue
    rotation preserves per-pixel channel SUM exactly (each matrix column
    sums to 1) before clipping."""
    from ssds_tpu.ops.augment_device import _photometric

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (8, 8, 3)), jnp.float32)
    for seed in range(50):
        out = np.asarray(_photometric(jax.random.PRNGKey(seed), img))
        assert out.min() >= -1e-3 and out.max() <= 255 + 1e-3

    # isolate the hue rotation: rotation matrix columns sum to 1
    theta = 0.42
    c, s = np.cos(theta), np.sin(theta)
    k = (1 - c) / 3
    sq = s / np.sqrt(3)
    rot = np.array([[c + k, k - sq, k + sq],
                    [k + sq, c + k, k - sq],
                    [k - sq, k + sq, c + k]])
    assert np.allclose(rot.sum(axis=0), 1.0)
    assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-12)  # pure rotation


def test_crop_candidates_respect_min_iou():
    """_sample_crop only accepts ROIs whose min-over-GT IoU clears the
    drawn threshold; with a full-image GT box, any accepted crop must keep
    IoU(GT, ROI) >= 0.1 (the smallest non-None mode)."""
    from ssds_tpu.ops.augment_device import _sample_crop

    boxes = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    valid = jnp.ones((1,), bool)
    for seed in range(40):
        ax, ay, bx, by = (float(v) for v in _sample_crop(
            jax.random.PRNGKey(seed), boxes, valid))
        if ax == 1.0 and ay == 1.0:
            continue  # mode None or no candidate
        # recover the ROI: a = 1/rw, b = -rx/rw
        rw, rh = 1.0 / ax, 1.0 / ay
        rx, ry = -bx * rw, -by * rh
        # IoU(full-image GT, ROI) == ROI area here
        assert rw * rh >= 0.1 - 1e-6, (seed, rw, rh)
        assert 0 - 1e-6 <= rx <= 1 - rw + 1e-6
        assert 0 - 1e-6 <= ry <= 1 - rh + 1e-6


def test_grad_does_not_flow_through_aug_rng():
    """augment_batch is jit/grad-safe inside a step (smoke)."""
    images, boxes, valid = planted_batch(b=2)

    @jax.jit
    def f(x):
        img, bx, vd = augment_batch(jax.random.PRNGKey(3), x, boxes, valid, 0.6)
        return jnp.sum(img ** 2)

    g = jax.grad(f)(images)
    assert np.isfinite(np.asarray(g)).all()


def test_train_step_with_device_aug():
    """build_train_step(device_aug_prob>0) runs: augmentation inside jit."""
    import optax

    from ssds_tpu.config import default_config
    from ssds_tpu.models.builder import create_model, create_priors, init_model
    from ssds_tpu.solver import TrainState, build_train_step

    cfg = default_config()
    cfg.MODEL.SSDS = "ssd_lite"
    cfg.MODEL.NETS = "mobilenet_v1_025"
    cfg.MODEL.IMAGE_SIZE = [96, 96]
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FEATURE_LAYER = [[11, 13], [128, 256]]
    cfg.MODEL.ASPECT_RATIOS = [[2], [2]]
    cfg.MODEL.SIZES = [0.3, 0.6, 0.9]
    model, fmaps = create_model(cfg.MODEL)
    priors = jnp.asarray(create_priors(cfg.MODEL, fmaps))
    variables = init_model(model, cfg.MODEL)
    tx = optax.sgd(0.01, momentum=0.9)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx)
    step = build_train_step(model, priors, False, (96, 96), jnp.float32,
                            pixel_means=(104, 117, 123), device_aug_prob=0.6)
    batch = {
        "images": jnp.full((2, 96, 96, 3), 120, jnp.uint8),
        "boxes": jnp.asarray([[[0.2, 0.2, 0.6, 0.6]], [[0.1, 0.1, 0.5, 0.5]]]),
        "labels": jnp.zeros((2, 1), jnp.int32),
        "valid": jnp.ones((2, 1), bool),
    }
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
