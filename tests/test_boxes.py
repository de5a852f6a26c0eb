import numpy as np
import jax.numpy as jnp
import pytest

from ssds_tpu.ops import boxes as B
import oracle


def random_boxes(rng, n):
    xy = rng.uniform(0, 0.8, (n, 2))
    wh = rng.uniform(0.05, 0.2, (n, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_point_center_roundtrip():
    rng = np.random.default_rng(0)
    b = random_boxes(rng, 32)
    back = np.asarray(B.point_form(B.center_size(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_jaccard_matches_oracle():
    rng = np.random.default_rng(1)
    a, b = random_boxes(rng, 13), random_boxes(rng, 7)
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    want = oracle.jaccard(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_jaccard_identity_and_disjoint():
    a = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
    b = np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]], np.float32)
    got = np.asarray(B.jaccard(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, [[1.0, 0.0]], atol=1e-6)


def test_jaccard_hand_case():
    # Half-overlapping unit squares: inter=0.5, union=1.5 -> IoU 1/3.
    a = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    b = np.array([[0.5, 0.0, 1.5, 1.0]], np.float32)
    got = float(B.jaccard(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert got == pytest.approx(1 / 3, abs=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(2)
    gt = random_boxes(rng, 20)
    priors_corner = random_boxes(rng, 20)
    priors = np.asarray(B.center_size(jnp.asarray(priors_corner)))
    enc = B.encode(jnp.asarray(gt), jnp.asarray(priors))
    dec = np.asarray(B.decode(enc, jnp.asarray(priors)))
    np.testing.assert_allclose(dec, gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(enc), oracle.encode(gt, priors), atol=1e-3)


def test_decode_matches_oracle():
    rng = np.random.default_rng(3)
    loc = rng.normal(0, 1, (50, 4)).astype(np.float32)
    priors = np.asarray(B.center_size(jnp.asarray(random_boxes(rng, 50))))
    got = np.asarray(B.decode(jnp.asarray(loc), jnp.asarray(priors)))
    np.testing.assert_allclose(got, oracle.decode(loc, priors), atol=1e-4)


def test_log_sum_exp_stable():
    x = jnp.asarray([[1000.0, 1000.0], [-1000.0, -1000.0], [0.0, 0.0]])
    got = np.asarray(B.log_sum_exp(x))[:, 0]
    want = np.array([1000.0, -1000.0, 0.0]) + np.log(2)
    np.testing.assert_allclose(got, want, atol=1e-4)
