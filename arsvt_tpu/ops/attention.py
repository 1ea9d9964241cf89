"""Multi-head attention.

Replaces the reference's naive `MultiHeadSelfAttention`
(/root/reference/train.py:518-555: fused-QKV linear, full S×S softmax
materialised in HBM, no flash attention) with:

  * `sdpa_reference` — pure-jnp scaled-dot-product attention with fp32
    softmax accumulation (the numerics oracle), and
  * a blockwise Pallas flash-attention kernel (`ops/pallas/flash_attention.py`)
    used automatically on TPU — streaming softmax, S×S scores never leave
    VMEM.

Supports self-attention (q is k is v) and cross-attention (DETR decoder
queries over patch tokens, /root/reference/train.py:721).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arsvt_tpu.ops.dispatch import force_jnp_attention, use_pallas


def sdpa_reference(q, k, v, *, mask=None, dropout_rate: float = 0.0,
                   dropout_rng=None):
    """Scaled dot-product attention, fp32 softmax island.

    q: (B, H, Sq, d), k/v: (B, H, Sk, d); mask: broadcastable to
    (B, H, Sq, Sk) with True = attend. Returns (B, H, Sq, d) in q.dtype.

    dropout_rate/dropout_rng: inverted dropout on the softmax
    probabilities — the reference applies it inside every attention
    (/root/reference/train.py:545); off unless both are given.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1e30, scores.dtype))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = 1.0 - dropout_rate
        dmask = jax.random.bernoulli(dropout_rng, keep, probs.shape)
        probs = jnp.where(dmask, probs / keep, 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention(q, k, v, *, mask=None, force_reference: bool = False,
                         dropout_rate: float = 0.0, dropout_rng=None):
    """Dispatching SDPA: Pallas flash attention on TPU, jnp reference elsewhere.

    Attention-probability dropout stays ON the kernel path: the flash
    kernels sample the mask statelessly from the TPU PRNG inside the kernel
    and replay it in backward (ops/pallas/flash_attention.py) — the faithful
    reference regularisation (train.py:545, rate 0.1) no longer forfeits the
    kernels. The jnp path's threefry mask differs bit-wise (same
    distribution). Arbitrary `mask` still routes to the reference impl.
    """
    dropping = dropout_rate > 0.0 and dropout_rng is not None
    if (force_reference or not use_pallas() or force_jnp_attention()
            or (dropping and mask is not None)):
        return sdpa_reference(
            q, k, v, mask=mask,
            dropout_rate=dropout_rate if dropping else 0.0,
            dropout_rng=dropout_rng,
        )
    from arsvt_tpu.ops.pallas.flash_attention import flash_attention

    return flash_attention(
        q, k, v, mask=mask,
        dropout_rate=dropout_rate if dropping else 0.0,
        dropout_rng=dropout_rng,
    )


def self_attention_from_qkv(qkv_flat, num_heads: int,
                            *, force_reference: bool = False,
                            dropout_rate: float = 0.0, dropout_rng=None):
    """Packed self-attention: (B, S, 3D) projection output -> (B, S, D).

    On TPU this dispatches to `flash_self_attention_packed`
    (ops/pallas/flash_attention.py) — a residual-lean custom VJP that
    re-derives the transposed q/k/v in backward; the reference path
    materialises the (3, B, H, S, d) transpose and runs `sdpa_reference`.
    """
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    head_dim = d // num_heads
    dropping = dropout_rate > 0.0 and dropout_rng is not None
    if not (force_reference or not use_pallas() or force_jnp_attention()):
        # Residual-lean fused path: saves (qkv_flat, out, lse) only — the
        # transpose+flash composition below would additionally store the
        # (3,B,H,S,hd) transposed views as residuals (~2.8 GB at ViT-B
        # bs256). The backward re-derives them from qkv_flat. Dropout stays
        # in-kernel (stateless TPU PRNG mask, replayed in backward).
        from arsvt_tpu.ops.pallas.flash_attention import (
            flash_self_attention_packed,
        )

        return flash_self_attention_packed(
            qkv_flat, num_heads,
            dropout_rate=dropout_rate if dropping else 0.0,
            dropout_rng=dropout_rng,
        )
    qkv = qkv_flat.reshape(b, s, 3, num_heads, head_dim)
    qkv = qkv.transpose(2, 0, 3, 1, 4)  # (3, B, H, S, hd)
    # NOTE: a fully-packed-layout kernel (avoiding the transposes *inside
    # the kernel* too) measured slower than transpose + per-head flash
    # (10.0 vs 6.0 ms fwd at ViT-B bs256) — strided slab reads in VMEM eat
    # the copy savings. Removed as dead weight (git history has it); the
    # production answer to the transposes is fused_encoder_attention.
    out = multi_head_attention(
        qkv[0], qkv[1], qkv[2], force_reference=force_reference,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)
