"""Objective-layer tests: boxes/GIoU, LAP matcher vs scipy, losses, triplet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from arsvt_tpu.objectives.boxes import (
    box_area,
    cxcywh_to_xyxy,
    elementwise_giou,
    pairwise_giou,
    pairwise_iou,
    xyxy_to_cxcywh,
)
from arsvt_tpu.objectives.detection_loss import (
    DetectionLossConfig,
    detection_loss,
    dominant_labels,
)
from arsvt_tpu.objectives.matcher import (
    MatcherConfig,
    lap_single,
    match,
)
from arsvt_tpu.objectives.triplet import batch_hard_triplet_loss


# ------------------------------------------------------------------- boxes


def test_box_format_roundtrip():
    boxes = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.3, 0.7, 0.1, 0.1]])
    np.testing.assert_allclose(
        np.asarray(xyxy_to_cxcywh(cxcywh_to_xyxy(boxes))),
        np.asarray(boxes), atol=1e-6,
    )


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 0.5, 0.5]])
    b = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.6, 0.6, 1.0, 1.0]])
    iou, _ = pairwise_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[1.0, 0.0]], atol=1e-6)


def test_giou_vs_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (8, 2, 2))
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=1).astype(np.float32)
    g = np.asarray(pairwise_giou(jnp.asarray(boxes), jnp.asarray(boxes)))

    def brute(a, b):
        ax1, ay1, ax2, ay2 = a
        bx1, by1, bx2, by2 = b
        inter = max(0, min(ax2, bx2) - max(ax1, bx1)) * max(
            0, min(ay2, by2) - max(ay1, by1)
        )
        ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
        iou = inter / ua
        cw = max(ax2, bx2) - min(ax1, bx1)
        ch = max(ay2, by2) - min(ay1, by1)
        c = cw * ch
        return iou - (c - ua) / c

    for i in range(8):
        for j in range(8):
            assert abs(g[i, j] - brute(boxes[i], boxes[j])) < 1e-5
    # diagonal is exactly 1
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-6)


def test_elementwise_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (5, 2, 2))
    a = np.concatenate([pts.min(1), pts.max(1)], axis=1).astype(np.float32)
    pts = rng.uniform(0, 1, (5, 2, 2))
    b = np.concatenate([pts.min(1), pts.max(1)], axis=1).astype(np.float32)
    full = np.asarray(pairwise_giou(jnp.asarray(a), jnp.asarray(b)))
    elem = np.asarray(elementwise_giou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(elem, np.diag(full), atol=1e-6)


# ----------------------------------------------------------------- matcher


@pytest.mark.parametrize("n", [1, 3, 8, 20])
def test_lap_matches_scipy(n):
    rng = np.random.default_rng(n)
    for _ in range(5):
        c = rng.uniform(0, 10, (n, n)).astype(np.float32)
        col = np.asarray(lap_single(jnp.asarray(c)))
        rows, cols = linear_sum_assignment(c)
        assert sorted(col.tolist()) == list(range(n))  # permutation
        np.testing.assert_allclose(
            c[np.arange(n), col].sum(), c[rows, cols].sum(), rtol=1e-5
        )


def test_match_respects_padding():
    # 1 real target, 3 padded; 4 queries -> exactly one matched query
    q, m, c = 4, 4, 6
    logits = jnp.zeros((1, q, c + 1))
    boxes = jnp.broadcast_to(
        jnp.array([0.5, 0.5, 0.2, 0.2]), (1, q, 4)
    )
    tgt_boxes = jnp.zeros((1, m, 4)).at[0, 0].set(
        jnp.array([0.4, 0.4, 0.6, 0.6])
    )
    tgt_labels = jnp.zeros((1, m), jnp.int32)
    tgt_mask = jnp.zeros((1, m), bool).at[0, 0].set(True)
    idx, matched = match(logits, boxes, tgt_labels, tgt_boxes, tgt_mask)
    assert int(matched.sum()) == 1
    assert int(idx[0, jnp.argmax(matched[0])]) == 0


def test_match_empty_targets():
    q, m, c = 3, 2, 6
    logits = jnp.zeros((2, q, c + 1))
    boxes = jnp.full((2, q, 4), 0.5)
    idx, matched = match(
        logits, boxes,
        jnp.zeros((2, m), jnp.int32),
        jnp.zeros((2, m, 4)),
        jnp.zeros((2, m), bool),
    )
    assert int(matched.sum()) == 0


def test_match_prefers_overlapping_query():
    # query 1 sits exactly on the target; it must win the assignment
    c = 6
    logits = jnp.zeros((1, 2, c + 1))
    boxes = jnp.array([[[0.1, 0.1, 0.1, 0.1], [0.5, 0.5, 0.2, 0.2]]])
    tgt_boxes = jnp.array([[[0.4, 0.4, 0.6, 0.6]]])  # xyxy == query 1
    idx, matched = match(
        logits, boxes,
        jnp.zeros((1, 1), jnp.int32), tgt_boxes, jnp.ones((1, 1), bool),
    )
    assert bool(matched[0, 1]) and not bool(matched[0, 0])


def test_device_matcher_equals_scipy_backend():
    rng = np.random.default_rng(7)
    b, q, m, c = 3, 5, 4, 6
    logits = jnp.asarray(rng.normal(size=(b, q, c + 1)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 4)), jnp.float32)
    pts = rng.uniform(0, 1, (b, m, 2, 2)).astype(np.float32)
    tgt_boxes = jnp.asarray(
        np.concatenate([pts.min(2), pts.max(2)], axis=-1)
    )
    tgt_labels = jnp.asarray(rng.integers(0, c, (b, m)), jnp.int32)
    tgt_mask = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)
    i1, m1 = match(logits, boxes, tgt_labels, tgt_boxes, tgt_mask,
                   MatcherConfig(backend="device"))
    i2, m2 = match(logits, boxes, tgt_labels, tgt_boxes, tgt_mask,
                   MatcherConfig(backend="scipy"))
    # both must match every real target (q >= m here)
    np.testing.assert_array_equal(
        np.asarray(m1).sum(1), np.asarray(tgt_mask).sum(1)
    )
    np.testing.assert_array_equal(
        np.asarray(m2).sum(1), np.asarray(tgt_mask).sum(1)
    )
    # and find the same optimal total matched cost
    from arsvt_tpu.objectives.matcher import build_cost_matrix

    for bi in range(b):
        cost = np.asarray(build_cost_matrix(
            logits[bi], boxes[bi], tgt_labels[bi], tgt_boxes[bi],
            tgt_mask[bi], MatcherConfig(),
        ))
        c1 = sum(cost[qi, int(i1[bi, qi])] for qi in range(q)
                 if bool(m1[bi, qi]))
        c2 = sum(cost[qi, int(i2[bi, qi])] for qi in range(q)
                 if bool(m2[bi, qi]))
        np.testing.assert_allclose(c1, c2, atol=2e-3)


# ------------------------------------------------------------------ losses


def _toy_batch(rng, b=2, q=5, m=3, c=6):
    logits = jnp.asarray(rng.normal(size=(b, q, c + 1)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.3, 0.7, (b, q, 4)), jnp.float32)
    pts = rng.uniform(0, 1, (b, m, 2, 2)).astype(np.float32)
    tgt_boxes = jnp.asarray(np.concatenate([pts.min(2), pts.max(2)], -1))
    tgt_labels = jnp.asarray(rng.integers(0, c, (b, m)), jnp.int32)
    tgt_mask = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)
    return (
        {"class_logits": logits, "boxes_cxcywh": boxes},
        {"boxes": tgt_boxes, "labels": tgt_labels, "mask": tgt_mask},
    )


def test_detection_loss_finite_and_weighted():
    rng = np.random.default_rng(0)
    outputs, targets = _toy_batch(rng)
    cfg = DetectionLossConfig()
    total, parts = jax.jit(
        lambda o, t: detection_loss(o, t, cfg)
    )(outputs, targets)
    assert np.isfinite(float(total))
    expected = (
        cfg.w_ce * float(parts["loss_ce"])
        + cfg.w_bbox * float(parts["loss_bbox"])
        + cfg.w_giou * float(parts["loss_giou"])
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)


def test_detection_loss_empty_targets_is_background_ce():
    rng = np.random.default_rng(1)
    outputs, targets = _toy_batch(rng)
    targets = {**targets, "mask": jnp.zeros_like(targets["mask"])}
    total, parts = detection_loss(outputs, targets, DetectionLossConfig())
    assert float(parts["loss_bbox"]) == 0.0
    assert float(parts["loss_giou"]) == 0.0
    assert float(parts["loss_ce"]) > 0.0  # background CE still teaches


def test_detection_loss_gradients_flow():
    rng = np.random.default_rng(2)
    outputs, targets = _toy_batch(rng)

    def f(o):
        total, _ = detection_loss(o, targets, DetectionLossConfig())
        return total

    grads = jax.grad(f)(outputs)
    assert float(jnp.abs(grads["class_logits"]).sum()) > 0
    assert float(jnp.abs(grads["boxes_cxcywh"]).sum()) > 0
    assert np.isfinite(np.asarray(grads["boxes_cxcywh"])).all()


def test_perfect_prediction_low_loss():
    c = 6
    tgt_boxes = jnp.array([[[0.4, 0.4, 0.6, 0.6]]])
    cxcywh = xyxy_to_cxcywh(tgt_boxes)
    logits = jnp.full((1, 1, c + 1), -10.0).at[0, 0, 2].set(10.0)
    outputs = {"class_logits": logits, "boxes_cxcywh": cxcywh}
    targets = {
        "boxes": tgt_boxes,
        "labels": jnp.full((1, 1), 2, jnp.int32),
        "mask": jnp.ones((1, 1), bool),
    }
    total, parts = detection_loss(outputs, targets, DetectionLossConfig())
    assert float(parts["loss_bbox"]) < 1e-5
    assert float(parts["loss_giou"]) < 1e-5
    assert float(parts["loss_ce"]) < 1e-4


def test_dominant_labels_count_based_reference_parity():
    """Hand-computed against the reference's rule (train.py:1038-1043):
    dominant label = most frequent class; ties -> lowest label id (np.unique
    sorts uniques ascending, np.argmax picks the first maximum)."""
    import numpy as _np

    labels = jnp.array([[0, 3, 3], [1, 2, 0]], jnp.int32)
    mask = jnp.array([[True, True, True], [True, True, False]])
    lab, valid = dominant_labels(labels, mask, 6)
    # image 0: counts {0:1, 3:2} -> 3; image 1 (third box masked out):
    # counts {1:1, 2:1} -> tie -> lowest label 1
    assert lab.tolist() == [3, 1]
    assert valid.tolist() == [True, True]
    # pin against the reference expression verbatim
    for row, m, got in zip(labels.tolist(), mask.tolist(), lab.tolist()):
        real = _np.asarray([l for l, keep in zip(row, m) if keep])
        uniq, counts = _np.unique(real, return_counts=True)
        assert got == int(uniq[_np.argmax(counts)])
    lab2, valid2 = dominant_labels(labels, jnp.zeros_like(mask), 6)
    assert valid2.tolist() == [False, False]


def test_coco_record_dominant_label_count_based():
    from arsvt_tpu.data.coco import ImageRecord
    import numpy as _np

    rec = ImageRecord(
        path="", width=10, height=10,
        boxes=_np.zeros((4, 4), _np.float32),
        labels=_np.array([5, 2, 2, 5], _np.int32),
        areas=_np.array([0.9, 0.01, 0.01, 0.01], _np.float32),
        iscrowd=_np.zeros(4, _np.int32), image_id=0,
    )
    # counts {2:2, 5:2} tie -> lowest label 2, even though label 5 has
    # far more total area (the old area-based rule would pick 5)
    assert rec.dominant_label == 2


# ----------------------------------------------------------------- triplet


def test_triplet_separated_clusters_zero_loss():
    f = jnp.array([[1.0, 0], [1.0, 0.01], [-1.0, 0], [-1.0, 0.01]])
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    labels = jnp.array([0, 0, 1, 1])
    valid = jnp.ones(4, bool)
    loss = batch_hard_triplet_loss(f, labels, valid, margin=0.3)
    assert float(loss) == 0.0


def test_triplet_overlapping_clusters_positive_loss():
    f = jnp.array([[1.0, 0], [-1.0, 0], [1.0, 0.01], [-1.0, 0.01]])
    f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
    labels = jnp.array([0, 0, 1, 1])  # positives are far, negatives near
    loss = batch_hard_triplet_loss(f, labels, jnp.ones(4, bool), margin=0.3)
    assert float(loss) > 0.3


def test_triplet_needs_pos_and_neg():
    f = jnp.eye(3)
    # all same label -> no negatives -> loss 0 (reference would crash/0)
    loss = batch_hard_triplet_loss(
        f, jnp.zeros(3, jnp.int32), jnp.ones(3, bool)
    )
    assert float(loss) == 0.0
    # all invalid -> 0
    loss = batch_hard_triplet_loss(
        f, jnp.arange(3, dtype=jnp.int32), jnp.zeros(3, bool)
    )
    assert float(loss) == 0.0


@pytest.mark.parametrize("q,m", [(5, 25), (25, 5), (7, 7), (1, 9), (9, 1)])
def test_lap_rect_matches_scipy(q, m):
    """Rectangular JV (scan over min(q,m) rows) == scipy on random costs,
    including the transposed q>m route used by match()."""
    from scipy.optimize import linear_sum_assignment

    from arsvt_tpu.objectives.matcher import lap_rect

    rng = np.random.default_rng(q * 100 + m)
    c = rng.uniform(0, 10, (q, m)).astype(np.float32)
    if q <= m:
        col = np.asarray(lap_rect(jnp.asarray(c)))
        rows, cols = linear_sum_assignment(c)
        assert len(set(col.tolist())) == q  # distinct columns
        np.testing.assert_allclose(
            c[np.arange(q), col].sum(), c[rows, cols].sum(), rtol=1e-5
        )
    else:
        row_for_col = np.asarray(lap_rect(jnp.asarray(c.T)))
        rows, cols = linear_sum_assignment(c)
        assert len(set(row_for_col.tolist())) == m
        np.testing.assert_allclose(
            c[row_for_col, np.arange(m)].sum(), c[rows, cols].sum(),
            rtol=1e-5,
        )


def test_detection_loss_rejects_head_mismatch():
    """num_classes disagreement with the head must fail the trace, not
    silently clamp class targets into the last foreground class."""
    import pytest

    from arsvt_tpu.objectives.detection_loss import (
        DetectionLossConfig,
        detection_loss,
    )

    outputs = {
        "class_logits": jnp.zeros((1, 5, 7)),   # 6-class head (C+1 = 7)
        "boxes_cxcywh": jnp.full((1, 5, 4), 0.5),
    }
    targets = {
        "boxes": jnp.full((1, 3, 4), 0.4),
        "labels": jnp.zeros((1, 3), jnp.int32),
        "mask": jnp.ones((1, 3), bool),
    }
    with pytest.raises(ValueError, match="num_classes"):
        detection_loss(outputs, targets, DetectionLossConfig(num_classes=10))
