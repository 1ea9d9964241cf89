"""Hungarian (bipartite) matching — device-side, jit-total.

The reference's matcher (/root/reference/train.py:854-978) moves every cost
matrix to the CPU (train.py:963) and runs scipy's C
`linear_sum_assignment` per image — a device→host sync in the middle of
every training step, the key serialization point SURVEY.md §3.2 flags. Here
the assignment solver itself runs on-device: a Jonker-Volgenant shortest
augmenting-path LAP (exact — same optimum scipy finds) written with
`lax.scan` / `lax.while_loop` on padded square costs, vmapped over the
batch, fully inside the jitted train step. A `jax.pure_callback` scipy
variant is kept behind the same interface as a cross-check oracle.

Padded targets (SURVEY.md §7 "ragged targets"): invalid target columns get
a large constant cost, so real targets always win real queries first;
queries left on padded columns are "unmatched" and read as background
downstream. The reference's ~15 empty/degenerate early-outs
(train.py:898-955) collapse into this one padding rule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from arsvt_tpu.objectives.boxes import (
    cxcywh_to_xyxy,
    pairwise_giou,
    xyxy_to_cxcywh,
)

# Pad cost must dominate any real cost (class<=1 + bbox<=4*w_bbox +
# giou<=2 => tens) while staying small enough that fp32 addition keeps the
# real-cost differences: at 1e4 the fp32 ulp is ~1e-3; at 1e6 it is ~0.06,
# which made distinct assignments spuriously tie.
_PAD_COST = 1e4
_INF = jnp.float32(1e30)


def lap_rect(cost):
    """Exact rectangular LAP (q, m) fp32 with q <= m, minimizing; returns
    col_for_row (q,) — every row gets a distinct column.

    Jonker-Volgenant shortest augmenting path with dual variables (u, v):
    one `lax.scan` over the q ROWS (not the padded square's max(q, m) —
    the round-1 version squared the matrix first, scanning 5x more rows
    for the reference's Q=5/M=25 shapes; the matcher was ~10% of the
    detector step for it), a `lax.while_loop` growing the alternating tree
    per row, vectorized O(m) tree expansion.
    """
    cost = cost.astype(jnp.float32)
    q, m = cost.shape
    rows = jnp.arange(q, dtype=jnp.int32)
    cols = jnp.arange(m, dtype=jnp.int32)

    def assign_row(carry, i):
        u, v, p = carry  # p[j] = row matched to col j, -1 if free

        # state of the alternating tree rooted at row i:
        #   minv[j]  best reduced cost to reach col j from the tree
        #   way[j]   predecessor col on that path (-1 = direct from i)
        #   used[j]  col j is in the tree
        #   tree[r]  row r is in the tree
        #   j1       candidate col (argmin of minv over unused)
        minv = cost[i] - u[i] - v
        way = jnp.full((m,), -1, jnp.int32)
        used = jnp.zeros((m,), bool)
        tree = jnp.zeros((q,), bool).at[i].set(True)
        j1 = jnp.argmin(minv)

        def cond(state):
            u, v, minv, way, used, tree, j1 = state
            return p[j1] != -1

        def body(state):
            u, v, minv, way, used, tree, j1 = state
            delta = minv[j1]
            u = u + jnp.where(tree, delta, 0.0)
            v = v - jnp.where(used, delta, 0.0)
            minv = jnp.where(used, minv, minv - delta)
            used = used.at[j1].set(True)
            row = p[j1]
            tree = tree.at[row].set(True)
            cur = cost[row] - u[row] - v
            improved = (cur < minv) & ~used
            minv = jnp.where(improved, cur, minv)
            way = jnp.where(improved, j1, way)
            j1_next = jnp.argmin(jnp.where(used, _INF, minv))
            return u, v, minv, way, used, tree, j1_next

        u, v, minv, way, used, tree, j_free = jax.lax.while_loop(
            cond, body, (u, v, minv, way, used, tree, j1)
        )

        # final dual update so the new matched edge becomes tight
        delta = minv[j_free]
        u = u + jnp.where(tree, delta, 0.0)
        v = v - jnp.where(used, delta, 0.0)

        # augment: walk predecessors from j_free, shifting assignments
        def aug_cond(state):
            j, _ = state
            return way[j] != -1

        def aug_body(state):
            j, p = state
            jprev = way[j]
            p = p.at[j].set(p[jprev])
            return jprev, p

        j_last, p = jax.lax.while_loop(aug_cond, aug_body, (j_free, p))
        p = p.at[j_last].set(i)
        return (u, v, p), None

    u0 = jnp.zeros((q,), jnp.float32)
    v0 = jnp.zeros((m,), jnp.float32)
    p0 = jnp.full((m,), -1, jnp.int32)
    (_, _, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), rows)
    # invert p (col -> row) into col_for_row (row -> col); unmatched cols
    # carry p[j] = -1 and are dropped
    col_for_row = jnp.zeros((q,), jnp.int32).at[
        jnp.where(p >= 0, p, q)
    ].set(cols, mode="drop")
    return col_for_row


def lap_single(cost):
    """Exact square LAP (n, n); returns col_for_row (n,)."""
    return lap_rect(cost)


lap_batch = jax.vmap(lap_single)


def lap_scipy_callback(cost):
    """Same result via jax.pure_callback → scipy (host round-trip oracle)."""
    import numpy as np

    def host(c):
        from scipy.optimize import linear_sum_assignment

        cc = np.asarray(c)
        flat = cc.reshape(-1, *cc.shape[-2:])
        out = np.zeros(flat.shape[:2], np.int32)
        for b in range(flat.shape[0]):
            rows, cols = linear_sum_assignment(flat[b])
            out[b, rows] = cols
        return out.reshape(cc.shape[:-1])

    return jax.pure_callback(
        host,
        jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32),
        cost,
        vmap_method="broadcast_all",
    )


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 1.0   # reference defaults (train.py:891-896)
    cost_bbox: float = 1.0
    cost_giou: float = 1.0
    backend: str = "device"   # "device" | "scipy"


def build_cost_matrix(class_logits, boxes_cxcywh, tgt_labels, tgt_boxes_xyxy,
                      tgt_mask, cfg: MatcherConfig):
    """Per-image cost (Q, M): class + L1 + GIoU terms, padded-target costs.

    class_logits (Q, C+1) fp32; boxes_cxcywh (Q, 4); tgt_labels (M,);
    tgt_boxes_xyxy (M, 4); tgt_mask (M,) bool.
    """
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    cost_class = -probs[:, tgt_labels]  # (Q, M)
    pred_xyxy = cxcywh_to_xyxy(boxes_cxcywh)
    # L1 cost in cxcywh, mirroring loss_bbox's DETR convention (the
    # matcher must minimize the same quantity the loss penalizes)
    tgt_cxcywh = xyxy_to_cxcywh(tgt_boxes_xyxy)
    cost_bbox = jnp.sum(
        jnp.abs(boxes_cxcywh[:, None, :] - tgt_cxcywh[None, :, :]), axis=-1
    )
    cost_giou = -pairwise_giou(pred_xyxy, tgt_boxes_xyxy)
    cost = (
        cfg.cost_class * cost_class
        + cfg.cost_bbox * cost_bbox
        + cfg.cost_giou * cost_giou
    )
    return jnp.where(tgt_mask[None, :], cost, _PAD_COST)


def match(class_logits, boxes_cxcywh, tgt_labels, tgt_boxes_xyxy, tgt_mask,
          cfg: MatcherConfig = MatcherConfig()):
    """Batched matching.

    class_logits (B,Q,C+1), boxes (B,Q,4), tgt_labels (B,M),
    tgt_boxes_xyxy (B,M,4), tgt_mask (B,M) bool.
    Returns (target_for_query (B,Q) int32, query_matched (B,Q) bool):
    `target_for_query[b,q]` is the target slot assigned to query q; the
    mask is True only where that slot holds a real (non-padded) target.
    """
    b, q, _ = class_logits.shape
    m = tgt_labels.shape[1]
    n = max(q, m)

    def per_image(cl, bx, tl, tb, tm):
        cost = build_cost_matrix(cl, bx, tl, tb, tm, cfg)  # (Q, M)
        if cfg.backend == "scipy":
            sq = jnp.full((n, n), _PAD_COST, jnp.float32)
            sq = sq.at[:q, :m].set(cost)
            col_q = lap_scipy_callback(sq)[:q]
        elif q <= m:
            # rectangular JV: scan q rows, not max(q, m) — the padded
            # square added dummy rows whose assignments are discarded
            col_q = lap_rect(cost)
        else:
            # more queries than target slots: solve the transpose (each
            # slot picks its query — same optimum as the padded square),
            # then invert; unassigned queries get the out-of-range m
            row_for_col = lap_rect(cost.T)  # (m,): query for each slot
            col_q = jnp.full((q,), m, jnp.int32).at[row_for_col].set(
                jnp.arange(m, dtype=jnp.int32)
            )
        in_range = col_q < m
        matched = in_range & tm[jnp.clip(col_q, 0, m - 1)]
        return col_q, matched

    return jax.vmap(per_image)(
        class_logits, boxes_cxcywh, tgt_labels, tgt_boxes_xyxy, tgt_mask
    )
