import numpy as np
import jax.numpy as jnp

from ssds_tpu.ops.nms import greedy_nms
import oracle


def random_dets(seed, n):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 0.7, (n, 2))
    wh = rng.uniform(0.05, 0.3, (n, 2))
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_oracle_keep_set_and_order():
    for seed in range(6):
        boxes, scores = random_dets(seed, 60)
        keep, keep_scores, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                              iou_threshold=0.5, top_k=60)
        got = list(np.asarray(keep)[: int(count)])
        want = oracle.nms(boxes, scores, overlap=0.5, top_k=60)
        assert got == want


def test_nms_suppresses_duplicates():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5],
                      [0.11, 0.11, 0.51, 0.51],
                      [0.6, 0.6, 0.9, 0.9]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep, _, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
    assert int(count) == 2
    assert list(np.asarray(keep)[:2]) == [0, 2]


def test_nms_respects_top_k():
    boxes, scores = random_dets(7, 100)
    # Disjoint-ish boxes with tiny threshold still capped at top_k.
    keep, _, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_threshold=1.0, top_k=10)
    assert int(count) == 10
    # Scores must come out in descending order.
    ks = np.asarray(scores)[np.asarray(keep)]
    assert (np.diff(ks) <= 1e-7).all()


def test_nms_handles_all_filtered():
    boxes, _ = random_dets(8, 20)
    scores = np.full(20, -np.inf, np.float32)
    keep, keep_scores, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    assert int(count) == 0
    assert (np.asarray(keep) == -1).all()
    assert (np.asarray(keep_scores) == 0).all()


def test_nms_zero_area_boxes_terminate():
    boxes = np.zeros((5, 4), np.float32)
    scores = np.array([0.5, 0.4, 0.3, 0.2, 0.1], np.float32)
    keep, _, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    # Zero-area boxes have IoU 0 with each other; each is selected once only.
    assert int(count) == 5
    assert sorted(np.asarray(keep).tolist()) == [0, 1, 2, 3, 4]


def test_sorted_nms_fixpoint_matches_sequential_oracle():
    """sorted_nms_batched (fixpoint Jacobi) must produce the EXACT keep set
    of the sequential suppression-propagation oracle, including deep
    suppression chains (overlapping ladders of boxes) and invalid slots."""
    import jax
    from ssds_tpu.ops.nms import NEG_INF, sorted_nms, sorted_nms_batched

    cases = []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = 64
        # Ladder: heavily-overlapping chains so A-sup-B, B-would-sup-C
        # resurrection paths actually occur.
        x = np.cumsum(rng.uniform(0.0, 0.05, n))
        boxes = np.stack([x, np.zeros(n), x + 0.3, np.full(n, 0.3)], 1)
        scores = np.sort(rng.uniform(0.1, 1.0, n))[::-1].copy()
        scores[rng.uniform(size=n) < 0.2] = NEG_INF  # invalid slots
        # keep descending order among valid (contract of sorted_nms)
        order = np.argsort(-scores, kind="stable")
        cases.append((boxes[order].astype(np.float32),
                      scores[order].astype(np.float32)))

    b = jnp.asarray(np.stack([c[0] for c in cases]))
    s = jnp.asarray(np.stack([c[1] for c in cases]))
    for thr in (0.3, 0.5, 0.7):
        got = np.asarray(sorted_nms_batched(b, s, thr))
        want = np.asarray(jax.vmap(lambda bb, ss: sorted_nms(bb, ss, thr))(b, s))
        np.testing.assert_array_equal(got, want)


def test_sorted_nms_tiled_matches_sequential_oracle():
    """sorted_nms_tiled (production _nms_mask path) == vmap(sorted_nms),
    including a pool size NOT divisible by the tile (padding path)."""
    import jax
    from ssds_tpu.ops.nms import NEG_INF, sorted_nms, sorted_nms_tiled

    for n in (64, 57):  # 57: exercises the pad-to-tile path
        cases = []
        for seed in range(4):
            rng = np.random.default_rng(100 + seed)
            x = np.cumsum(rng.uniform(0.0, 0.05, n))
            boxes = np.stack([x, np.zeros(n), x + 0.3, np.full(n, 0.3)], 1)
            scores = np.sort(rng.uniform(0.1, 1.0, n))[::-1].copy()
            scores[rng.uniform(size=n) < 0.2] = NEG_INF
            order = np.argsort(-scores, kind="stable")
            cases.append((boxes[order].astype(np.float32),
                          scores[order].astype(np.float32)))
        b = jnp.asarray(np.stack([c[0] for c in cases]))
        s = jnp.asarray(np.stack([c[1] for c in cases]))
        for thr in (0.3, 0.6):
            got = np.asarray(sorted_nms_tiled(b, s, thr, tile=20))
            want = np.asarray(jax.vmap(lambda bb, ss: sorted_nms(bb, ss, thr))(b, s))
            np.testing.assert_array_equal(got, want)
