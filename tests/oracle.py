"""Pure-numpy oracle implementing the reference's detection-math SEMANTICS.

Written directly from the behavioral spec in SURVEY.md §2.4 (match rule,
variance encoding, hard-negative mining, greedy NMS) — slow Python loops on
purpose, mirroring the reference's sequential structure so the vectorized
JAX implementations can be tested against the exact sequential behavior
(including the "later GT wins a shared best prior" forcing rule and greedy
NMS suppression order).
"""

import numpy as np


def point_form(boxes):
    return np.concatenate([boxes[:, :2] - boxes[:, 2:] / 2, boxes[:, :2] + boxes[:, 2:] / 2], 1)


def jaccard(a, b):
    out = np.zeros((len(a), len(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            x1 = max(a[i, 0], b[j, 0])
            y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2])
            y2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            union = area_a + area_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def encode(matched, priors, variances=(0.1, 0.2)):
    g_cxcy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    g_cxcy /= variances[0] * priors[:, 2:]
    g_wh = np.log(np.maximum(matched[:, 2:] - matched[:, :2], 1e-8) / priors[:, 2:]) / variances[1]
    return np.concatenate([g_cxcy, g_wh], 1)


def decode(loc, priors, variances=(0.1, 0.2)):
    cxcy = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    wh = priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    return np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1)


def match(truths, labels, priors, threshold=0.5, variances=(0.1, 0.2)):
    """Sequential reference matching: returns (loc_t [K,4], conf_t [K])."""
    overlaps = jaccard(truths, point_form(priors))  # [G, K]
    best_truth_overlap = overlaps.max(0)
    best_truth_idx = overlaps.argmax(0)
    best_prior_idx = overlaps.argmax(1)  # per GT
    # Sequential forcing loop — later j overwrites earlier on collisions.
    for j in range(len(truths)):
        best_truth_idx[best_prior_idx[j]] = j
        best_truth_overlap[best_prior_idx[j]] = 2.0
    matched = truths[best_truth_idx]
    conf = labels[best_truth_idx] + 1
    conf[best_truth_overlap < threshold] = 0
    loc = encode(matched, priors, variances)
    return loc, conf.astype(np.int64)


def log_sum_exp(x):
    m = x.max(-1, keepdims=True)
    return np.log(np.exp(x - m).sum(-1, keepdims=True)) + m


def multibox_loss(loc_pred, conf_pred, gt_boxes, gt_labels, priors,
                  threshold=0.5, negpos_ratio=3):
    """Reference MultiBoxLoss: gt_boxes/labels are per-image LISTS (var length)."""
    B, K, C = conf_pred.shape
    loc_t = np.zeros((B, K, 4))
    conf_t = np.zeros((B, K), dtype=np.int64)
    for b in range(B):
        loc_t[b], conf_t[b] = match(gt_boxes[b], gt_labels[b], priors, threshold)
    pos = conf_t > 0
    num_pos = pos.sum(1)

    d = loc_pred - loc_t
    ad = np.abs(d)
    sl1 = np.where(ad < 1, 0.5 * d * d, ad - 0.5)
    loss_l = (sl1 * pos[..., None]).sum()

    loss_c = log_sum_exp(conf_pred)[..., 0] - np.take_along_axis(
        conf_pred, conf_t[..., None], -1)[..., 0]
    loss_c[pos] = 0
    loss_idx = np.argsort(-loss_c, axis=1)
    idx_rank = np.argsort(loss_idx, axis=1)
    num_neg = np.clip(negpos_ratio * num_pos, None, K - 1)
    neg = idx_rank < num_neg[:, None]

    sel = pos | neg
    logp = conf_pred - log_sum_exp(conf_pred)
    ce = -np.take_along_axis(logp, conf_t[..., None], -1)[..., 0]
    loss_conf = ce[sel].sum()
    n = max(num_pos.sum(), 1)
    return loss_l / n, loss_conf / n


def nms(boxes, scores, overlap=0.5, top_k=200):
    """Sequential greedy NMS over the top_k highest-scoring candidates.

    Tie order: equal scores rank index-ASCENDING (stable descending sort).
    This is the framework-wide contract — ``lax.top_k`` documents the same
    rule ("lower index first" on ties) and ``jnp.argmax`` returns the first
    max — and is what a stable form of the reference's
    ``scores.sort(descending=True)`` yields (``box_utils.nms:~220–300``).
    """
    order = np.argsort(-scores, kind="stable")[:top_k].tolist()
    keep = []
    while order:
        i = order.pop(0)
        keep.append(i)
        rest = []
        for j in order:
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a_i + a_j - inter
            iou = inter / union if union > 0 else 0.0
            if iou <= overlap:
                rest.append(j)
        order = rest
    return keep
