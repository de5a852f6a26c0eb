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


def quantized_dets(seed, n, levels=8):
    """Random boxes with COARSELY quantized scores — many exact ties, the
    bf16-softmax-rounding regime the tie contract exists for."""
    boxes, scores = random_dets(seed, n)
    scores = np.round(scores * levels) / levels
    return boxes, scores.astype(np.float32)


def test_tied_scores_greedy_matches_oracle():
    """Equal-score candidates rank index-ascending (VERDICT r4 #4):
    greedy_nms (argmax = first max) must equal the stable-sort oracle in
    both keep SET and keep ORDER under heavy ties."""
    for seed in range(8):
        boxes, scores = quantized_dets(seed, 60)
        keep, _, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    iou_threshold=0.5, top_k=60)
        got = list(np.asarray(keep)[: int(count)])
        want = oracle.nms(boxes, scores, overlap=0.5, top_k=60)
        assert got == want, f"seed {seed}"


def test_tied_scores_all_equal_pins_index_order():
    """All scores identical: selection must walk indices ascending."""
    boxes, _ = random_dets(3, 12)
    scores = np.full(12, 0.5, np.float32)
    keep, _, count = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_threshold=1.01, top_k=12)  # no suppression
    assert list(np.asarray(keep)[: int(count)]) == list(range(12))


def test_tied_scores_topk_sorted_nms_chain_matches_oracle():
    """The production ordering chain: lax.top_k candidate sort (lower index
    first on ties) -> sorted_nms suppression == oracle on the RAW scores.
    This is the path postprocess.detect runs."""
    import jax
    from ssds_tpu.ops.nms import sorted_nms, sorted_nms_tiled

    for seed in range(6):
        boxes, scores = quantized_dets(200 + seed, 48)
        vals, idx = jax.lax.top_k(jnp.asarray(scores), 48)
        sb = jnp.asarray(boxes)[idx]
        want = oracle.nms(boxes, scores, overlap=0.5, top_k=48)
        for fn in (lambda b, s: sorted_nms(b, s, 0.5),
                   lambda b, s: sorted_nms_tiled(b[None], s[None], 0.5,
                                                 tile=20)[0]):
            keep_mask = np.asarray(fn(sb, vals))
            got = np.asarray(idx)[keep_mask].tolist()
            assert got == want, f"seed {seed}"
