"""Bipartite GT↔prior matching, vectorized over the batch.

Behavioral spec source: reference ``box_utils.match``
(lib/utils/box_utils.py:~60–110, SURVEY.md §2.4):

1. ``overlaps = jaccard(truths, point_form(priors))``                 [G, K]
2. each prior gets its best GT (``best_truth_overlap/idx``, max over G)
3. each GT is FORCED onto its best prior: that prior's overlap is set to 2
   and its GT index overwritten; the reference's Python loop runs j = 0..G-1
   in order so when two GTs share a best prior the LATER GT wins.
4. ``conf = labels[best_truth_idx] + 1``; priors with overlap < threshold
   become background (0); ``loc = encode(truths[best_truth_idx], priors)``.

TPU-first design: ground truth is padded to a fixed ``[G, 4]`` with a
validity mask (XLA static shapes); the whole function is pure jnp and is
``vmap``-ed over the batch by the loss. The sequential forcing loop is
replaced by an equivalent vectorized "highest valid GT index wins" argmax.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ssds_tpu.ops.boxes import encode, jaccard, point_form


def match(
    truths: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    priors: jnp.ndarray,
    threshold: float = 0.5,
    variances=(0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match one image's (padded) ground truth to the prior set.

    Args:
      truths: ``[G, 4]`` corner-form GT boxes, padded with zeros.
      labels: ``[G]`` int class indices (0-based, NOT including background).
      valid:  ``[G]`` bool mask of real (non-padding) GT rows.
      priors: ``[K, 4]`` center-form anchors.
      threshold: IoU below which a prior is background (reference: 0.5).
      variances: SSD encoding variances.

    Returns:
      ``loc_t [K, 4]`` encoded regression targets and ``conf_t [K]`` int32
      class targets where 0 = background and ``c+1`` = class ``c``.
    """
    num_gt = truths.shape[0]
    overlaps = jaccard(truths, point_form(priors))  # [G, K]
    # Invalid (padded) GT rows must never win a prior.
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    # Step 2: per-prior best GT.
    best_truth_overlap = jnp.max(overlaps, axis=0)  # [K]
    best_truth_idx = jnp.argmax(overlaps, axis=0)  # [K]

    # Step 3: force each valid GT onto its best prior. The reference loop
    # iterates j in increasing order, so the highest j sharing a best prior
    # wins — reproduced by taking max over matching GT indices per prior.
    best_prior_idx = jnp.argmax(overlaps, axis=1)  # [G]
    gt_ids = jnp.arange(num_gt)
    # forced[j, k] = GT j is valid and its best prior is k
    forced = valid[:, None] & (best_prior_idx[:, None] == jnp.arange(priors.shape[0])[None, :])
    forced_gt = jnp.max(jnp.where(forced, gt_ids[:, None], -1), axis=0)  # [K]
    is_forced = forced_gt >= 0
    best_truth_idx = jnp.where(is_forced, forced_gt, best_truth_idx)
    best_truth_overlap = jnp.where(is_forced, 2.0, best_truth_overlap)

    # Gather GT rows per prior via one-hot select: row gathers from [G,*]
    # lower to ~2 ms/step scalar-gather fusions on TPU, while the [K,G]
    # compare + reduce is a fused VPU op (profile: tools/step_profile.py).
    sel = best_truth_idx[:, None] == gt_ids[None, :]  # [K, G] exact one-hot
    matched = jnp.einsum("kg,gd->kd", sel.astype(truths.dtype), truths)  # [K, 4]
    conf_t = jnp.sum(jnp.where(sel, labels[None, :].astype(jnp.int32) + 1, 0), axis=1)
    conf_t = jnp.where(best_truth_overlap < threshold, 0, conf_t)
    loc_t = encode(matched, priors, variances)
    # Padded-out images (no valid GT at all) are pure background.
    conf_t = jnp.where(jnp.any(valid), conf_t, jnp.zeros_like(conf_t))
    return loc_t, conf_t
