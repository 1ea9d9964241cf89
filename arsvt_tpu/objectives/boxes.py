"""Box utilities: format conversion, IoU, GIoU — fully vectorized.

Rebuild of `generalized_box_iou` (/root/reference/train.py:994-1024) without
its degenerate-box asserts (train.py:996-997): boxes here are cxcywh from a
sigmoid head (degeneracy-free by construction, models/heads.py) and the
functions are jit-total — no data-dependent branches, fp32 math.
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_xyxy(boxes):
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xyxy_to_cxcywh(boxes):
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes_xyxy):
    wh = jnp.clip(boxes_xyxy[..., 2:] - boxes_xyxy[..., :2], 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a_xyxy, b_xyxy):
    """a: (..., N, 4), b: (..., M, 4) -> iou (..., N, M), union (..., N, M)."""
    area_a = box_area(a_xyxy)[..., :, None]
    area_b = box_area(b_xyxy)[..., None, :]
    lt = jnp.maximum(a_xyxy[..., :, None, :2], b_xyxy[..., None, :, :2])
    rb = jnp.minimum(a_xyxy[..., :, None, 2:], b_xyxy[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9), union


def pairwise_giou(a_xyxy, b_xyxy):
    """GIoU = IoU - (enclosing - union) / enclosing, in [-1, 1]."""
    iou, union = pairwise_iou(a_xyxy, b_xyxy)
    lt = jnp.minimum(a_xyxy[..., :, None, :2], b_xyxy[..., None, :, :2])
    rb = jnp.maximum(a_xyxy[..., :, None, 2:], b_xyxy[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    enclose = jnp.maximum(wh[..., 0] * wh[..., 1], 1e-9)
    return iou - (enclose - union) / enclose


def elementwise_giou(a_xyxy, b_xyxy):
    """GIoU between aligned boxes: (..., 4), (..., 4) -> (...)."""
    area_a = box_area(a_xyxy)
    area_b = box_area(b_xyxy)
    lt = jnp.maximum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb = jnp.minimum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, 1e-9)
    lt_e = jnp.minimum(a_xyxy[..., :2], b_xyxy[..., :2])
    rb_e = jnp.maximum(a_xyxy[..., 2:], b_xyxy[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0, None)
    enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], 1e-9)
    return iou - (enclose - union) / enclose
