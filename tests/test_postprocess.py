import numpy as np
import pytest
import jax.numpy as jnp

from ssds_tpu.ops.boxes import center_size, encode
from ssds_tpu.ops.postprocess import PostProcessConfig, detect


def test_detect_recovers_planted_boxes():
    """Plant confident, well-separated GT boxes; detect must return them."""
    rng = np.random.default_rng(0)
    K, C = 64, 5
    xy = rng.uniform(0.05, 0.6, (K, 2))
    wh = rng.uniform(0.1, 0.3, (K, 2))
    priors_corner = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    priors = np.asarray(center_size(jnp.asarray(priors_corner)))

    planted = np.array([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.9, 0.9]], np.float32)
    planted_cls = [1, 3]
    # loc predictions that decode prior 0 -> planted[0], prior 1 -> planted[1]
    loc = np.zeros((K, 4), np.float32)
    loc[0] = np.asarray(encode(jnp.asarray(planted[0:1]), jnp.asarray(priors[0:1])))[0]
    loc[1] = np.asarray(encode(jnp.asarray(planted[1:2]), jnp.asarray(priors[1:2])))[0]
    conf = np.full((K, C), 0.001, np.float32)
    conf[:, 0] = 0.99
    conf[0, :] = 0.01
    conf[0, planted_cls[0]] = 0.95
    conf[1, :] = 0.01
    conf[1, planted_cls[1]] = 0.90

    cfg = PostProcessConfig(num_classes=C, score_threshold=0.5,
                            iou_threshold=0.45, max_detections=10)
    out = np.asarray(detect(jnp.asarray(loc[None]), jnp.asarray(conf[None]),
                            jnp.asarray(priors), cfg))[0]
    assert out.shape == (C, 10, 5)
    # Background row empty.
    assert (out[0] == 0).all()
    np.testing.assert_allclose(out[1, 0, 0], 0.95, atol=1e-5)
    np.testing.assert_allclose(out[1, 0, 1:], planted[0], atol=1e-3)
    np.testing.assert_allclose(out[3, 0, 0], 0.90, atol=1e-5)
    np.testing.assert_allclose(out[3, 0, 1:], planted[1], atol=1e-3)
    # Nothing else above the 0.5 threshold.
    assert (out[1, 1:, 0] == 0).all() and (out[2, :, 0] == 0).all()


def test_detect_nms_suppresses_within_class_only():
    K, C = 8, 3
    priors_corner = np.tile(np.array([[0.4, 0.4, 0.6, 0.6]], np.float32), (K, 1))
    priors = np.asarray(center_size(jnp.asarray(priors_corner)))
    loc = np.zeros((K, 4), np.float32)
    conf = np.full((K, C), 0.0, np.float32)
    conf[0, 1] = 0.9
    conf[1, 1] = 0.8  # same box, same class -> suppressed
    conf[2, 2] = 0.7  # same box, other class -> kept
    cfg = PostProcessConfig(num_classes=C, score_threshold=0.5,
                            iou_threshold=0.5, max_detections=5)
    out = np.asarray(detect(jnp.asarray(loc[None]), jnp.asarray(conf[None]),
                            jnp.asarray(priors), cfg))[0]
    assert (out[1, :, 0] > 0).sum() == 1
    assert (out[2, :, 0] > 0).sum() == 1


def test_detect_batched_shapes():
    rng = np.random.default_rng(1)
    B_, K, C = 4, 32, 4
    xy = rng.uniform(0.1, 0.7, (K, 2))
    wh = rng.uniform(0.05, 0.2, (K, 2))
    priors = np.concatenate([xy, wh], 1).astype(np.float32)
    loc = rng.normal(0, 0.1, (B_, K, 4)).astype(np.float32)
    conf = rng.uniform(0, 1, (B_, K, C)).astype(np.float32)
    cfg = PostProcessConfig(num_classes=C, max_detections=7)
    out = detect(jnp.asarray(loc), jnp.asarray(conf), jnp.asarray(priors), cfg)
    assert out.shape == (B_, C, 7, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_pre_nms_pool_wider_than_output():
    """Reference Detect feeds NMS top_k (~200) candidates and OUTPUTS up to
    MAX_DETECTIONS: with the pool truncated to MAX_DETECTIONS before NMS
    (round-1 behavior), a suppressed high-rank box starves a legitimate
    lower-ranked detection (VERDICT r1 item 5)."""
    from ssds_tpu.ops.postprocess import detect_decoded

    C = 2  # background + one class
    # 3 candidates: A (best), B (duplicate of A, suppressed), C (elsewhere)
    boxes = np.array([
        [0.10, 0.10, 0.30, 0.30],   # A
        [0.11, 0.11, 0.31, 0.31],   # B ~ A
        [0.60, 0.60, 0.80, 0.80],   # C
    ], np.float32)
    conf = np.zeros((3, C), np.float32)
    conf[:, 1] = [0.9, 0.8, 0.7]

    wide = PostProcessConfig(num_classes=C, score_threshold=0.05,
                             iou_threshold=0.5, max_detections=2, top_k=3)
    out = np.asarray(detect_decoded(
        jnp.asarray(boxes[None]), jnp.asarray(conf[None]), wide))[0]
    kept_scores = sorted(out[1, out[1, :, 0] > 0, 0].tolist(), reverse=True)
    assert kept_scores == pytest.approx([0.9, 0.7], abs=1e-5)  # C survives

    narrow = PostProcessConfig(num_classes=C, score_threshold=0.05,
                               iou_threshold=0.5, max_detections=2, top_k=2)
    out = np.asarray(detect_decoded(
        jnp.asarray(boxes[None]), jnp.asarray(conf[None]), narrow))[0]
    kept_scores = out[1, out[1, :, 0] > 0, 0].tolist()
    assert kept_scores == pytest.approx([0.9], abs=1e-5)  # C starved


def test_pre_nms_prune_exact_when_pool_covers_candidates():
    """The class-agnostic pre-NMS prune (PostProcessConfig.pre_nms_top_n,
    ops/postprocess.py) is gated to batch >= 4 and is exact whenever the
    global top-N pool covers every above-threshold candidate — the
    documented approximation contract. Randomized batch-8 case with a
    peaked score distribution (few candidates clear the threshold, as a
    trained model produces): pruned output must be bit-identical to the
    exact (pre_nms_top_n=0) path."""
    rng = np.random.default_rng(7)
    B, K, C = 8, 256, 6
    xy = rng.uniform(0.05, 0.8, (K, 2))
    wh = rng.uniform(0.05, 0.15, (K, 2))
    priors = np.asarray(center_size(jnp.asarray(
        np.concatenate([xy, xy + wh], 1).astype(np.float32))))
    loc = rng.normal(0, 0.1, (B, K, 4)).astype(np.float32)
    # peaked scores: background-heavy, ~20 priors/image above threshold
    conf = rng.uniform(0, 0.05, (B, K, C)).astype(np.float32)
    conf[:, :, 0] = 0.9
    for b in range(B):
        hot = rng.choice(K, size=20, replace=False)
        conf[b, hot, 1 + (hot % (C - 1))] = rng.uniform(0.3, 0.95, 20)

    exact_cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                                  iou_threshold=0.5, max_detections=10,
                                  top_k=32, pre_nms_top_n=0)
    pruned_cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                                   iou_threshold=0.5, max_detections=10,
                                   top_k=32, pre_nms_top_n=64)
    out_exact = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                  jnp.asarray(priors), exact_cfg))
    out_pruned = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                   jnp.asarray(priors), pruned_cfg))
    assert (out_exact[..., 0] > 0).sum() > B  # the case is non-trivial
    np.testing.assert_array_equal(out_exact, out_pruned)


def test_pre_nms_prune_inactive_below_batch4():
    """At batch < 4 the prune gate must leave the exact path in place even
    when pre_nms_top_n is set (the batch-1 latency guard measured in
    ops/postprocess.py): outputs equal the exact config's bit-for-bit on a
    case where an ACTIVE tiny pool would visibly drop detections."""
    rng = np.random.default_rng(3)
    B, K, C = 2, 128, 4
    xy = rng.uniform(0.05, 0.8, (K, 2))
    wh = rng.uniform(0.05, 0.15, (K, 2))
    priors = np.asarray(center_size(jnp.asarray(
        np.concatenate([xy, xy + wh], 1).astype(np.float32))))
    loc = rng.normal(0, 0.1, (B, K, 4)).astype(np.float32)
    conf = rng.uniform(0.2, 0.9, (B, K, C)).astype(np.float32)  # everything hot
    exact_cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                                  iou_threshold=0.5, max_detections=10,
                                  top_k=32, pre_nms_top_n=0)
    gated_cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                                  iou_threshold=0.5, max_detections=10,
                                  top_k=32, pre_nms_top_n=8)
    out_exact = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                  jnp.asarray(priors), exact_cfg))
    out_gated = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                  jnp.asarray(priors), gated_cfg))
    np.testing.assert_array_equal(out_exact, out_gated)


def test_onehot_gather_bit_exact():
    """The batch>=4 one-hot-matmul gathers must match the fancy-index
    gather BIT-for-bit (ops/postprocess._gather_rows_exact: 0/1 one-hot x
    Precision.HIGHEST reconstructs the f32 rows exactly — the round-5
    formulation that halves the COCO postprocess tail)."""
    import jax

    from ssds_tpu.ops.postprocess import _gather_rows_exact

    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.uniform(0, 1, (4, 257, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 257, (4, 513)).astype(np.int32))
    via_dot = np.asarray(jax.jit(_gather_rows_exact, static_argnums=2)(
        src, idx, 257))
    via_index = np.asarray(jax.vmap(lambda b, i: b[i])(src, idx))
    np.testing.assert_array_equal(via_dot, via_index)


def test_detect_batch4_matches_batch1_rows():
    """The batched (>=4) detect path — one-hot gathers — must give each
    image the rows the batch-1 path gives it. Tolerance 1e-6, not bitwise:
    the two batch sizes are DIFFERENT compiled programs and XLA's FMA
    contraction in decode may differ by 1 ulp between them (observed
    7.5e-9 on one coordinate on CPU); the gather formulations themselves
    are bit-exact given identical inputs (test_onehot_gather_bit_exact)."""
    rng = np.random.default_rng(11)
    B, K, C = 4, 256, 6
    xy = rng.uniform(0.05, 0.8, (K, 2))
    wh = rng.uniform(0.05, 0.15, (K, 2))
    priors = np.asarray(center_size(jnp.asarray(
        np.concatenate([xy, xy + wh], 1).astype(np.float32))))
    loc = rng.normal(0, 0.1, (B, K, 4)).astype(np.float32)
    conf = rng.uniform(0.0, 0.2, (B, K, C)).astype(np.float32)
    for b in range(B):
        hot = rng.integers(0, K, 30)
        conf[b, hot, 1 + (hot % (C - 1))] = rng.uniform(0.3, 0.95, 30)
    cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                            iou_threshold=0.5, max_detections=10,
                            top_k=32, pre_nms_top_n=0)
    batched = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                jnp.asarray(priors), cfg))
    for b in range(B):
        single = np.asarray(detect(jnp.asarray(loc[b:b + 1]),
                                   jnp.asarray(conf[b:b + 1]),
                                   jnp.asarray(priors), cfg))
        np.testing.assert_allclose(batched[b], single[0], atol=1e-6)


def test_onehot_gather_per_class_bit_exact():
    """The C>=32 per-class chunked one-hot gather must equal the
    fancy-index gather bit-for-bit (ops/postprocess.
    _gather_rows_exact_per_class — the COCO-class-count serving path; no
    small-C fast test reaches it, so pin the primitive directly)."""
    import jax

    from ssds_tpu.ops.postprocess import _gather_rows_exact_per_class

    rng = np.random.default_rng(13)
    B, N, C, K = 4, 130, 40, 17
    src = jnp.asarray(rng.uniform(0, 1, (B, N, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, C, K)).astype(np.int32))
    via_dot = np.asarray(jax.jit(
        _gather_rows_exact_per_class, static_argnums=2)(src, idx, N))
    via_index = np.asarray(jax.vmap(lambda b, i: b[i])(
        src, idx.reshape(B, C * K))).reshape(B, C, K, 4)
    np.testing.assert_array_equal(via_dot, via_index)


def test_detect_many_classes_chunked_path():
    """detect at C=40, batch 4 (the chunked-gather branch) recovers a
    planted box per image exactly like the batch-1 path does."""
    rng = np.random.default_rng(17)
    B, K, C = 4, 128, 40
    xy = rng.uniform(0.05, 0.8, (K, 2))
    wh = rng.uniform(0.05, 0.15, (K, 2))
    priors = np.asarray(center_size(jnp.asarray(
        np.concatenate([xy, xy + wh], 1).astype(np.float32))))
    loc = rng.normal(0, 0.05, (B, K, 4)).astype(np.float32)
    conf = rng.uniform(0.0, 0.2, (B, K, C)).astype(np.float32)
    for b in range(B):
        hot = rng.integers(0, K, 12)
        conf[b, hot, 1 + (hot % (C - 1))] = rng.uniform(0.4, 0.95, 12)
    cfg = PostProcessConfig(num_classes=C, score_threshold=0.1,
                            iou_threshold=0.5, max_detections=10,
                            top_k=32, pre_nms_top_n=0)
    batched = np.asarray(detect(jnp.asarray(loc), jnp.asarray(conf),
                                jnp.asarray(priors), cfg))
    assert (batched[..., 0] > 0).sum() > B
    for b in range(B):
        single = np.asarray(detect(jnp.asarray(loc[b:b + 1]),
                                   jnp.asarray(conf[b:b + 1]),
                                   jnp.asarray(priors), cfg))
        np.testing.assert_allclose(batched[b], single[0], atol=1e-6)
