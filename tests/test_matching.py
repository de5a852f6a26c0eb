import numpy as np
import jax.numpy as jnp

from ssds_tpu.ops import boxes as B
from ssds_tpu.ops.matching import match
import oracle


def make_priors(n, rng):
    xy = rng.uniform(0.1, 0.9, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    return np.concatenate([xy, wh], 1).astype(np.float32)


def pad_gt(truths, labels, max_gt=16):
    g = len(truths)
    tb = np.zeros((max_gt, 4), np.float32)
    tl = np.zeros((max_gt,), np.int32)
    tv = np.zeros((max_gt,), bool)
    tb[:g], tl[:g], tv[:g] = truths, labels, True
    return tb, tl, tv


def run_both(truths, labels, priors, threshold=0.5):
    tb, tl, tv = pad_gt(truths, labels)
    loc_j, conf_j = match(jnp.asarray(tb), jnp.asarray(tl), jnp.asarray(tv),
                          jnp.asarray(priors), threshold)
    loc_o, conf_o = oracle.match(truths, labels.astype(np.int64), priors, threshold)
    return np.asarray(loc_j), np.asarray(conf_j), loc_o, conf_o


def test_match_random_agrees_with_oracle():
    rng = np.random.default_rng(0)
    priors = make_priors(120, rng)
    for seed in range(5):
        r = np.random.default_rng(seed)
        g = r.integers(1, 8)
        xy = r.uniform(0, 0.7, (g, 2))
        wh = r.uniform(0.1, 0.3, (g, 2))
        truths = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        labels = r.integers(0, 20, g).astype(np.int32)
        loc_j, conf_j, loc_o, conf_o = run_both(truths, labels, priors)
        np.testing.assert_array_equal(conf_j, conf_o)
        np.testing.assert_allclose(loc_j, loc_o, atol=2e-3)


def test_forced_match_every_gt_gets_a_prior():
    rng = np.random.default_rng(3)
    priors = make_priors(200, rng)
    # A tiny GT box with low IoU against everything must still match.
    truths = np.array([[0.01, 0.01, 0.02, 0.02]], np.float32)
    labels = np.array([4], np.int32)
    _, conf_j, _, conf_o = run_both(truths, labels, priors)
    assert (conf_j == 5).sum() >= 1
    np.testing.assert_array_equal(conf_j, conf_o)


def test_shared_best_prior_later_gt_wins():
    # Two GTs engineered to share the same best prior; reference's sequential
    # loop lets the LATER one win.
    priors = np.asarray(B.center_size(jnp.asarray(np.array(
        [[0.4, 0.4, 0.6, 0.6], [0.0, 0.0, 0.1, 0.1]], np.float32))))
    truths = np.array([[0.4, 0.4, 0.6, 0.6], [0.41, 0.41, 0.61, 0.61]], np.float32)
    labels = np.array([1, 2], np.int32)
    loc_j, conf_j, loc_o, conf_o = run_both(truths, labels, priors)
    np.testing.assert_array_equal(conf_j, conf_o)
    assert conf_j[0] == 3  # label 2 + 1 → later GT won
    np.testing.assert_allclose(loc_j, loc_o, atol=2e-3)


def test_empty_image_all_background():
    rng = np.random.default_rng(4)
    priors = make_priors(50, rng)
    tb = np.zeros((16, 4), np.float32)
    tl = np.zeros((16,), np.int32)
    tv = np.zeros((16,), bool)
    loc_j, conf_j = match(jnp.asarray(tb), jnp.asarray(tl), jnp.asarray(tv),
                          jnp.asarray(priors))
    assert (np.asarray(conf_j) == 0).all()
    assert np.isfinite(np.asarray(loc_j)).all()


def test_threshold_controls_background():
    rng = np.random.default_rng(5)
    priors = make_priors(100, rng)
    truths = np.array([[0.2, 0.2, 0.5, 0.5]], np.float32)
    labels = np.array([0], np.int32)
    _, conf_low, _, _ = run_both(truths, labels, priors, threshold=0.1)
    _, conf_high, _, _ = run_both(truths, labels, priors, threshold=0.9)
    assert (conf_low > 0).sum() >= (conf_high > 0).sum()
    assert (conf_high > 0).sum() >= 1  # forced match survives any threshold
