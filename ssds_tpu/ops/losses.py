"""MultiBox loss with hard-negative mining, fully vectorized over the batch.

Behavioral spec source: reference ``lib/layers/modules/multibox_loss.py``
(SURVEY.md §2.4):

- per-image ``match()`` produces encoded loc targets + class targets;
- Smooth-L1 on positive priors' loc predictions;
- hard-negative mining: rank negatives by ``log_sum_exp(conf) - conf[gt]``
  per image, keep ``negpos_ratio (3) * num_pos`` (clamped to K-1) negatives;
- softmax cross-entropy over positives ∪ selected negatives;
- both terms normalized by the total positive count N (max'ed with 1).

TPU-first design: the reference loops images in Python and calls ``match``
per image on CPU; here matching is ``vmap``-ed and the mining uses the
double-argsort rank trick — one ``jit``-able function, no host sync.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ssds_tpu.ops.boxes import log_sum_exp
from ssds_tpu.ops.matching import match


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (Huber with delta=1), as torch's ``smooth_l1_loss``."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def hard_negative_ranks(loss_c: jnp.ndarray) -> jnp.ndarray:
    """Per-image descending rank of each prior's mining loss.

    ``loss_c: [B, K]`` -> int ranks ``[B, K]`` where rank 0 is the largest
    loss. This is the reference's double-argsort trick
    (multibox_loss.py:~80): ``_, loss_idx = loss_c.sort(1, descending=True);
    _, idx_rank = loss_idx.sort(1)``.
    """
    loss_idx = jnp.argsort(-loss_c, axis=1)
    return jnp.argsort(loss_idx, axis=1)


def multibox_loss(
    loc_pred: jnp.ndarray,
    conf_pred: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    priors: jnp.ndarray,
    *,
    threshold: float = 0.5,
    negpos_ratio: float = 3.0,
    variances=(0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute ``(loss_loc, loss_conf)`` for a batch.

    Args:
      loc_pred:  ``[B, K, 4]`` predicted offsets.
      conf_pred: ``[B, K, C]`` raw (pre-softmax) class logits, C incl. background.
      gt_boxes:  ``[B, G, 4]`` corner-form GT, zero-padded.
      gt_labels: ``[B, G]`` int class ids (0-based, background NOT included).
      gt_valid:  ``[B, G]`` bool validity mask.
      priors:    ``[K, 4]`` center-form anchors.

    Returns:
      Scalar ``(loss_loc, loss_conf)``, each normalized by total positives.
    """
    conf_pred = conf_pred.astype(jnp.float32)
    loc_pred = loc_pred.astype(jnp.float32)
    loc_t, conf_t = jax.vmap(
        lambda t, l, v: match(t, l, v, priors, threshold, variances)
    )(gt_boxes, gt_labels, gt_valid)
    # loc_t: [B, K, 4]; conf_t: [B, K]

    pos = conf_t > 0  # [B, K]
    num_pos = jnp.sum(pos, axis=1)  # [B]

    # Localization: smooth-L1 over positives only.
    loss_l = jnp.sum(smooth_l1(loc_pred - loc_t) * pos[..., None].astype(jnp.float32))

    # Mining loss per prior: log_sum_exp(logits) - logit[gt_class]. The
    # class-dim gather is a one-hot multiply-reduce: take_along_axis over
    # [B,K,C] lowers to a ~4 ms/step gather fusion on TPU, the one-hot
    # form fuses to a VPU reduce (profile: tools/step_profile.py). Exact:
    # multiplying by 0/1 and summing selects bit-identically.
    batch_conf = conf_pred  # [B, K, C]
    onehot = jax.nn.one_hot(conf_t, batch_conf.shape[-1], dtype=jnp.float32)
    gathered = jnp.sum(batch_conf * onehot, axis=-1)
    loss_c = log_sum_exp(batch_conf)[..., 0] - gathered  # [B, K]
    loss_c = jnp.where(pos, 0.0, loss_c)  # never mine positives

    ranks = hard_negative_ranks(loss_c)  # [B, K]
    num_priors = conf_pred.shape[1]
    num_neg = jnp.clip(negpos_ratio * num_pos, max=num_priors - 1)  # [B]
    neg = ranks < num_neg[:, None]  # [B, K]

    # Confidence: softmax CE over positives ∪ mined negatives.
    selected = (pos | neg).astype(jnp.float32)
    log_probs = jax.nn.log_softmax(batch_conf, axis=-1)
    ce = -jnp.sum(log_probs * onehot, axis=-1)
    loss_conf = jnp.sum(ce * selected)

    n = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
    return loss_l / n, loss_conf / n
