"""Batch-hard triplet loss — the working version of the reference's dead code.

The reference's TripletLoss/TripletMiner (/root/reference/train.py:1027-1117)
never produces a gradient: `torch.where(cond)` returns a 1-tuple so
`len(valid_indices) < 3` (train.py:1049-1052) is always true and the loss
early-returns 0; `batch_size = features.shape` (train.py:1034, missing [0])
and the configured `'batch_hard'` strategy never matching `'hard'`
(train.py:1372 vs 1069) would each break it independently. SURVEY.md §2.12.

This implements the intended objective jit-total: for each valid anchor,
hardest positive = max same-label distance, hardest negative = min
different-label distance, hinge at `margin` on squared-L2 of L2-normalized
features; masked mean over anchors that have ≥1 positive and ≥1 negative.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_hard_triplet_loss(features, labels, valid, *, margin: float = 0.3):
    """features (B, D) L2-normalized fp32; labels (B,) int; valid (B,) bool."""
    f = features.astype(jnp.float32)
    # squared euclidean distances via gram matrix
    gram = f @ f.T
    sq = jnp.sum(f * f, axis=1)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)

    same = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = (~same) & valid[:, None] & valid[None, :]

    big = jnp.float32(1e9)
    hardest_pos = jnp.max(jnp.where(pos_mask, d2, -big), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d2, big), axis=1)

    anchor_ok = valid & jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
    losses = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    denom = jnp.maximum(jnp.sum(anchor_ok.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(anchor_ok, losses, 0.0)) / denom
