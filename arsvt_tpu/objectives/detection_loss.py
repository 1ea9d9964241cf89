"""DETR losses: weighted CE + L1 + GIoU + cardinality (+ triplet).

Rebuild of `ObjectDetectionLoss` (/root/reference/train.py:1188-1339) in
jit-total form: no per-image Python branches, everything masked. The loss
pieces and their semantics:

  * labels  — CE over (C+1) classes with background weight 0.1
              (train.py:1215-1217,1236); unmatched queries learn background.
  * boxes   — L1 on cxcywh + GIoU on xyxy between matched pairs, normalized
              by the (clamped) number of real boxes (train.py:1242-1278).
  * cardinality — L1 between #non-background predictions and #targets;
              implemented-but-unused in the reference (train.py:1281-1293),
              reported here as a metric like DETR does (not a gradient).
  * triplet — batch-hard margin triplet on image-level features with
              dominant-class labels. The reference's is dead code: its
              `torch.where` tuple bug at train.py:1049-1052 makes it return
              0 always, `batch_size = features.shape` (train.py:1034) and
              the 'batch_hard' vs 'hard' strategy mismatch (train.py:1372
              vs 1069) would crash/no-op it anyway. This one works — see
              `objectives/triplet.py`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from arsvt_tpu.objectives.boxes import (
    cxcywh_to_xyxy,
    elementwise_giou,
    xyxy_to_cxcywh,
)
from arsvt_tpu.objectives.matcher import MatcherConfig, match
from arsvt_tpu.objectives.triplet import batch_hard_triplet_loss


@dataclasses.dataclass(frozen=True)
class DetectionLossConfig:
    num_classes: int = 6
    background_weight: float = 0.1   # train.py:1215-1217
    w_ce: float = 1.0                # WEIGHT_DICT (train.py:1375-1380)
    w_bbox: float = 5.0
    w_giou: float = 2.0
    w_triplet: float = 0.6
    triplet_margin: float = 0.3      # train.py:1370
    matcher: MatcherConfig = MatcherConfig()


def detection_loss(outputs, targets, cfg: DetectionLossConfig,
                   triplet_features=None):
    """outputs: {'class_logits': (B,Q,C+1), 'boxes_cxcywh': (B,Q,4)};
    targets: {'boxes': (B,M,4) xyxy normalized, 'labels': (B,M) int32,
    'mask': (B,M) bool}. Returns (total, dict of unweighted parts).
    """
    logits = outputs["class_logits"].astype(jnp.float32)
    pred_boxes = outputs["boxes_cxcywh"].astype(jnp.float32)
    num_logits = logits.shape[-1]
    c = cfg.num_classes
    if num_logits != c + 1:
        # shapes are static at trace time, so this fails the jit trace —
        # without it take_along_axis clamps out-of-range class targets
        # (incl. the background index) and silently trains real objects
        # toward the last foreground class
        raise ValueError(
            f"class_logits last dim is {num_logits}, expected "
            f"num_classes+1 = {c + 1} — head and loss config disagree"
        )
    tgt_boxes = targets["boxes"].astype(jnp.float32)
    tgt_labels = targets["labels"]
    tgt_mask = targets["mask"]

    tgt_idx, matched = match(
        logits, pred_boxes, tgt_labels, tgt_boxes, tgt_mask, cfg.matcher
    )
    # stop-gradient through the assignment (match indices are discrete)
    tgt_idx = jax.lax.stop_gradient(tgt_idx)
    matched = jax.lax.stop_gradient(matched)

    safe_idx = jnp.clip(tgt_idx, 0, tgt_labels.shape[1] - 1)
    gather_labels = jnp.take_along_axis(tgt_labels, safe_idx, axis=1)
    # class target: matched -> target label, else background (index c)
    class_target = jnp.where(matched, gather_labels, c)

    # --- labels: weighted CE over queries -----------------------------
    logp = jax.nn.log_softmax(logits, axis=-1)  # (B,Q,C+1)
    ce = -jnp.take_along_axis(logp, class_target[..., None], axis=-1)[..., 0]
    weights = jnp.where(matched, 1.0, cfg.background_weight)
    loss_ce = jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1e-9)

    # --- boxes: L1 (cxcywh, DETR convention) + GIoU (xyxy) -------------
    # The reference computes L1 on its raw sigmoid outputs, de-facto xyxy
    # (train.py:1242-1278 with the corner-box head); DETR proper uses
    # cxcywh, which weights center vs size errors evenly — our head is
    # natively cxcywh so we follow DETR here (deliberate deviation).
    gather_boxes = jnp.take_along_axis(
        tgt_boxes, safe_idx[..., None], axis=1
    )  # (B,Q,4) xyxy
    pred_xyxy = cxcywh_to_xyxy(pred_boxes)
    num_boxes = jnp.maximum(jnp.sum(matched.astype(jnp.float32)), 1.0)
    l1 = jnp.sum(
        jnp.abs(pred_boxes - xyxy_to_cxcywh(gather_boxes)), axis=-1
    )
    loss_bbox = jnp.sum(l1 * matched) / num_boxes
    giou = elementwise_giou(pred_xyxy, gather_boxes)
    loss_giou = jnp.sum((1.0 - giou) * matched) / num_boxes

    # --- cardinality (metric only, train.py:1281-1293) ----------------
    pred_fg = jnp.sum(
        (jnp.argmax(logits, axis=-1) != c).astype(jnp.float32), axis=1
    )
    n_tgt = jnp.sum(tgt_mask.astype(jnp.float32), axis=1)
    cardinality = jnp.mean(jnp.abs(pred_fg - n_tgt))

    parts = {
        "loss_ce": loss_ce,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "cardinality_error": jax.lax.stop_gradient(cardinality),
    }
    total = (
        cfg.w_ce * loss_ce + cfg.w_bbox * loss_bbox + cfg.w_giou * loss_giou
    )

    # --- triplet on image-level features ------------------------------
    if triplet_features is not None:
        image_labels, image_valid = dominant_labels(tgt_labels, tgt_mask, c)
        loss_triplet = batch_hard_triplet_loss(
            triplet_features, image_labels, image_valid,
            margin=cfg.triplet_margin,
        )
        parts["loss_triplet"] = loss_triplet
        total = total + cfg.w_triplet * loss_triplet

    parts["total"] = total
    return total, parts


def dominant_labels(tgt_labels, tgt_mask, num_classes):
    """Most-frequent class per image — the reference's count-based rule
    (train.py:1038-1043: `np.unique(labels, return_counts=True)` then
    `unique_labels[np.argmax(counts)]`). Ties resolve to the LOWEST label
    id, exactly as argmax over np.unique's ascending-sorted uniques does.

    Returns (labels (B,), valid (B,) bool) — invalid where an image has no
    real boxes.
    """
    onehot = jax.nn.one_hot(
        jnp.clip(tgt_labels, 0, num_classes - 1), num_classes,
        dtype=jnp.float32,
    )  # (B, M, C)
    counts = jnp.sum(onehot * tgt_mask[..., None], axis=1)  # (B, C)
    # jnp.argmax picks the first maximum -> lowest label id on ties
    return jnp.argmax(counts, axis=-1).astype(jnp.int32), jnp.any(
        tgt_mask, axis=1
    )
