import numpy as np
import jax
import jax.numpy as jnp

from ssds_tpu.ops.losses import multibox_loss, hard_negative_ranks
import oracle


def setup(seed=0, batch=3, n_priors=80, n_classes=6, max_gt=10):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0.1, 0.9, (n_priors, 2))
    wh = rng.uniform(0.05, 0.3, (n_priors, 2))
    priors = np.concatenate([xy, wh], 1).astype(np.float32)
    loc_pred = rng.normal(0, 1, (batch, n_priors, 4)).astype(np.float32)
    conf_pred = rng.normal(0, 2, (batch, n_priors, n_classes)).astype(np.float32)

    gt_list_boxes, gt_list_labels = [], []
    gt_boxes = np.zeros((batch, max_gt, 4), np.float32)
    gt_labels = np.zeros((batch, max_gt), np.int32)
    gt_valid = np.zeros((batch, max_gt), bool)
    for b in range(batch):
        g = rng.integers(1, 6)
        bxy = rng.uniform(0, 0.6, (g, 2))
        bwh = rng.uniform(0.1, 0.4, (g, 2))
        boxes = np.concatenate([bxy, bxy + bwh], 1).astype(np.float32)
        labels = rng.integers(0, n_classes - 1, g)
        gt_list_boxes.append(boxes)
        gt_list_labels.append(labels.astype(np.int64))
        gt_boxes[b, :g], gt_labels[b, :g], gt_valid[b, :g] = boxes, labels, True
    return priors, loc_pred, conf_pred, gt_boxes, gt_labels, gt_valid, gt_list_boxes, gt_list_labels


def test_loss_matches_oracle():
    priors, loc_pred, conf_pred, gtb, gtl, gtv, lb, ll = setup()
    ll_j, lc_j = multibox_loss(jnp.asarray(loc_pred), jnp.asarray(conf_pred),
                               jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv),
                               jnp.asarray(priors))
    ll_o, lc_o = oracle.multibox_loss(loc_pred.astype(np.float64),
                                      conf_pred.astype(np.float64), lb, ll, priors)
    np.testing.assert_allclose(float(ll_j), ll_o, rtol=1e-4)
    np.testing.assert_allclose(float(lc_j), lc_o, rtol=1e-4)


def test_hard_negative_ranks():
    loss_c = jnp.asarray([[0.1, 3.0, 2.0, 0.5]])
    ranks = np.asarray(hard_negative_ranks(loss_c))[0]
    np.testing.assert_array_equal(ranks, [3, 0, 1, 2])


def test_loss_is_differentiable_and_finite():
    priors, loc_pred, conf_pred, gtb, gtl, gtv, *_ = setup(seed=1)

    def total(lp, cp):
        l, c = multibox_loss(lp, cp, jnp.asarray(gtb), jnp.asarray(gtl),
                             jnp.asarray(gtv), jnp.asarray(priors))
        return l + c

    g_loc, g_conf = jax.grad(total, argnums=(0, 1))(
        jnp.asarray(loc_pred), jnp.asarray(conf_pred))
    assert np.isfinite(np.asarray(g_loc)).all()
    assert np.isfinite(np.asarray(g_conf)).all()
    # Negative-prior loc predictions receive no gradient.
    from ssds_tpu.ops.matching import match
    _, conf_t = jax.vmap(lambda t, l, v: match(t, l, v, jnp.asarray(priors)))(
        jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv))
    neg = np.asarray(conf_t) == 0
    assert np.abs(np.asarray(g_loc)[neg]).max() == 0.0


def test_all_background_batch_is_finite():
    priors, loc_pred, conf_pred, gtb, gtl, gtv, *_ = setup(seed=2)
    gtv[:] = False
    l, c = multibox_loss(jnp.asarray(loc_pred), jnp.asarray(conf_pred),
                         jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv),
                         jnp.asarray(priors))
    assert np.isfinite(float(l)) and np.isfinite(float(c))
    assert float(l) == 0.0


def test_loss_under_jit_and_bf16_conf():
    priors, loc_pred, conf_pred, gtb, gtl, gtv, *_ = setup(seed=3)
    f = jax.jit(lambda lp, cp: multibox_loss(
        lp, cp, jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv), jnp.asarray(priors)))
    l, c = f(jnp.asarray(loc_pred), jnp.asarray(conf_pred, dtype=jnp.bfloat16))
    assert np.isfinite(float(l)) and np.isfinite(float(c))
