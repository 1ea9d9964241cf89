"""Classification objectives: CE with label smoothing, mixup, top-1.

North-star surface (BASELINE.json): 6-class recycling taxonomy trained with
cross-entropy; ViT-L preset adds RandAugment + mixup. All reductions in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits, labels, *, num_classes: int,
                          label_smoothing: float = 0.0):
    """logits (B, C) fp32; labels int (B,) or soft (B, C). Mean CE."""
    logits = logits.astype(jnp.float32)
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    else:
        onehot = labels.astype(jnp.float32)
    if label_smoothing > 0.0:
        onehot = (
            onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
        )
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def mixup(key, images, labels, *, num_classes: int, alpha: float = 0.2):
    """Beta(alpha, alpha) mixup; returns (mixed images, soft labels).

    Partners come from a random permutation, not a fixed batch roll —
    roll pairing is only as diverse as the batch order, so an unshuffled
    or class-clustered stream would mix same-class neighbours every step
    and silently weaken the regularisation."""
    b = images.shape[0]
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha, ())
    perm = jax.random.permutation(k_perm, b)
    mixed = lam * images + (1.0 - lam) * images[perm]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    soft = lam * onehot + (1.0 - lam) * onehot[perm]
    return mixed.astype(images.dtype), soft


def accuracy_top1(logits, labels):
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def confusion_matrix(preds, labels, num_classes: int):
    """Device-side confusion matrix (rows = truth, cols = prediction)."""
    idx = labels * num_classes + preds
    counts = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(1)
    return counts.reshape(num_classes, num_classes)
