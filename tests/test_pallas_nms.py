"""Pallas NMS kernel vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ssds_tpu.ops.nms import NEG_INF, sorted_nms
from ssds_tpu.ops.pallas.nms import nms_mask_pallas


def random_candidates(m=6, n=128, seed=0):
    rng = np.random.default_rng(seed)
    cxcy = rng.uniform(0.2, 0.8, (m, n, 2))
    wh = rng.uniform(0.05, 0.4, (m, n, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0.01, 1.0, (m, n)).astype(np.float32), axis=-1)[:, ::-1]
    # mark a tail of each row invalid (score-threshold-filtered padding)
    for i in range(m):
        k = rng.integers(n // 2, n)
        scores[i, k:] = float(NEG_INF)
    return jnp.asarray(boxes), jnp.asarray(np.ascontiguousarray(scores))


def test_pallas_matches_oracle_interpret():
    boxes, scores = random_candidates()
    want = jax.vmap(lambda b, s: sorted_nms(b, s, 0.5))(boxes, scores)
    got = nms_mask_pallas(boxes, scores, 0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_thresholds_interpret():
    boxes, scores = random_candidates(m=4, seed=3)
    for thr in (0.3, 0.45, 0.7):
        want = jax.vmap(lambda b, s: sorted_nms(b, s, thr))(boxes, scores)
        got = nms_mask_pallas(boxes, scores, thr, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_all_invalid_row():
    boxes, scores = random_candidates(m=2, seed=5)
    scores = scores.at[1].set(NEG_INF)
    got = nms_mask_pallas(boxes, scores, 0.5, interpret=True)
    assert not bool(np.asarray(got)[1].any())
