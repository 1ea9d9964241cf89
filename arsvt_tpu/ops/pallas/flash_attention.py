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

Layout notes (pallas_guide.md): block shapes equal the (S, d) array dims —
Mosaic pads VMEM tiles internally, no host-side padding happens. The legacy
kernels accept a compiled-in `kv_len` for key-side masking of padded
sequences (currently every caller passes kv_len == S, so the mask branch
compiles out); the direct-layout kernels (_fwd_kernel_direct /
_bwd_kernel_direct) take no kv_len and assume exact lengths — a padded-
sequence caller must use the legacy path. Batch is blocked (block_b) to
amortise grid steps at ViT's small S; mask value is -0.7*f32max, not -inf.

All in-kernel matmuls pin precision=DEFAULT explicitly: tests set the
global `jax_default_matmul_precision=highest` (for fp32 oracle numerics on
CPU), which Mosaic cannot lower for these bf16 dots — the explicit
argument keeps the kernels immune to the ambient config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


# ------------------------------------------------------- stateless dropout
#
# Attention-probability dropout INSIDE the kernels (the reference applies
# dropout to the softmax probabilities of every attention and trains its
# detector with rate 0.1 — /root/reference/train.py:528,545,1352). The
# flash kernels never materialise probabilities, so the mask is generated
# statelessly from the TPU PRNG: seeded per (grid cell, unrolled item
# [, head-in-group]) with a unique mixed index, the backward kernel replays
# the exact same seeding sequence and regenerates the identical mask — no
# (B,H,Sq,Sk) mask tensor ever exists in HBM. Mosaic's prng_seed accepts at
# most TWO int32s, so the grid/item indices are folded into one.
#
# Math (keep = 1 - rate, M = Bernoulli(keep)):
#   forward:  out = ((M ∘ P)/keep) @ V  with P = softmax(S); lse saved
#             PRE-dropout (the mask does not change the normalizer).
#   backward: dV = ((M ∘ P)/keep)ᵀ dO
#             dP = (M ∘ (dO Vᵀ))/keep
#             dS = P ∘ (dP − Δ),  Δ = rowsum(dO ∘ O)
#             (rowsum(dP ∘ P) = rowsum(dO ∘ ((M∘P/keep)@V)) = Δ because
#             (M∘P/keep)@V is exactly O — the no-dropout flash identity
#             still holds with the dropped-out O.)


def _dropout_threshold(rate: float) -> int:
    # keep iff bits < threshold, bits ~ U[0, 2^32)
    return min(int((1.0 - rate) * 2**32), 2**32 - 1)


def _keep_mask(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits < jnp.uint32(_dropout_threshold(rate))


def seed_from_rng(rng) -> jax.Array:
    """Derive the (1,) int32 SMEM seed the kernels consume from a JAX PRNG
    key — one draw per step/layer; in-kernel mixing makes per-cell streams."""
    bits = jax.random.bits(rng, (1,), jnp.uint32)
    return jax.lax.bitcast_convert_type(bits, jnp.int32)


_FLOAT0_SEED_COT = np.zeros((1,), dtype=jax.dtypes.float0)


# ------------------------------------------------------------------ forward


def _fwd_kernel(*refs, scale, kv_len, dropout_rate=0.0):
    if dropout_rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
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
        if dropout_rate > 0.0:
            # unique stream per (ABSOLUTE batch item, head) — independent of
            # block_b, so a forward and backward that pick different batch
            # tilings still replay the identical mask
            mixed = ((pl.program_id(0) * bb + i)
                     * pl.num_programs(1) + pl.program_id(1))
            pltpu.prng_seed(seed_ref[0], mixed)
            keep = _keep_mask(p.shape, dropout_rate)
            p_use = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
        else:
            p_use = p
        o = jax.lax.dot(
            p_use.astype(v_ref.dtype), v_ref[i, 0],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        o_ref[i, 0] = (o / l).astype(o_ref.dtype)
        # (1, Sq) row; the block's 8-sublane VMEM padding is internal —
        # the HBM residual stays (B, H, 1, S), 8x smaller than a broadcast
        lse_ref[i, 0] = (m + jnp.log(l))[:, 0][None, :]


def _fwd(q, k, v, *, scale, kv_len, block_b, interpret=False,
         dropout_rate=0.0, seed=None):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b // block_b, h)
    qspec = pl.BlockSpec((block_b, 1, sq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((block_b, 1, sk, d), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec]
    operands = (q, k, v)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            qspec,
            pl.BlockSpec((block_b, 1, 1, sq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ),
        compiler_params=_attn_compiler_params(),
        interpret=interpret,
    )(*operands)
    return out, lse


# ----------------------------------------------------------------- backward


def _bwd_kernel(*refs, scale, kv_len, dropout_rate=0.0):
    if dropout_rate > 0.0:
        (seed_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
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
        if dropout_rate > 0.0:
            # regenerate the forward's mask: identical seeding sequence
            mixed = ((pl.program_id(0) * bb + i)
                     * pl.num_programs(1) + pl.program_id(1))
            pltpu.prng_seed(seed_ref[0], mixed)
            keep = _keep_mask(p.shape, dropout_rate)
            inv_keep = 1.0 / (1.0 - dropout_rate)
            dp = jnp.where(keep, dp * inv_keep, 0.0)
            p_v = jnp.where(keep, p * inv_keep, 0.0)  # for dV
        else:
            p_v = p
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
            p_v.astype(do_ref.dtype), do_ref[i, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        dq_ref[i, 0] = dq.astype(dq_ref.dtype)
        dk_ref[i, 0] = dk.astype(dk_ref.dtype)
        dv_ref[i, 0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, o, do, lse, *, scale, kv_len, block_b,
              interpret=False, dropout_rate=0.0, seed=None):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b // block_b, h)
    qspec = pl.BlockSpec((block_b, 1, sq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((block_b, 1, sk, d), lambda i, j: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((block_b, 1, 1, sq), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kvspec, kvspec, qspec, qspec, lspec]
    operands = (q, k, v, o, do, lse)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=kv_len,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=(qspec, kvspec, kvspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ),
        compiler_params=_attn_compiler_params(),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------- public op


def _pick_block_b(b: int, sq: int, sk: int) -> int:
    # keep the fp32 scores tile under ~2.5 MB per grid cell; the flat 32
    # cap bounds the unrolled loop's slab + temp VMEM for small-score
    # shapes (e.g. the DETR decoder's 10x144 cross-attention, where the
    # score budget alone would pick the whole batch and the backward's
    # per-iteration fp32 temps blow the 16 MB scoped-vmem stack)
    import os

    override = os.environ.get("ARSVT_ATTN_BLOCK_B")  # tuning experiments
    if override:
        bb = max(1, min(int(override), b))
    else:
        budget = int(2.5 * 1024 * 1024)
        per_item = sq * sk * 4
        bb = max(1, min(budget // max(per_item, 1), 32))
    while b % bb:
        bb -= 1
    return bb


def _attn_compiler_params():
    """Shared CompilerParams for the attention kernels; ARSVT_ATTN_VMEM_MB
    raises Mosaic's 16 MB scoped-VMEM default for block-size experiments
    (the chip has 128 MB of VMEM)."""
    import os

    mb = os.environ.get("ARSVT_ATTN_VMEM_MB")
    kw = {"dimension_semantics": ("parallel", "parallel")}
    if mb:
        kw["vmem_limit_bytes"] = int(mb) * 1024 * 1024
    return pltpu.CompilerParams(**kw)


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


# ------------------------------------------------ dropout variant (q/k/v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_dropout(q, k, v, seed, kv_len, rate, interpret):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    block_b = _pick_block_b(q.shape[0], q.shape[2], k.shape[2])
    out, _ = _fwd(q, k, v, scale=scale, kv_len=kv_len, block_b=block_b,
                  interpret=interpret, dropout_rate=rate, seed=seed)
    return out


def _flash_dropout_vjp_fwd(q, k, v, seed, kv_len, rate, interpret):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    block_b = _pick_block_b(q.shape[0], q.shape[2], k.shape[2])
    out, lse = _fwd(q, k, v, scale=scale, kv_len=kv_len, block_b=block_b,
                    interpret=interpret, dropout_rate=rate, seed=seed)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse, seed)


def _flash_dropout_vjp_bwd(kv_len, rate, interpret, saved, g):
    q, k, v, out, lse, seed = saved
    scale = 1.0 / (q.shape[-1] ** 0.5)
    block_b = _pick_block_b(q.shape[0], q.shape[2], k.shape[2])
    dq, dk, dv = _bwd_call(q, k, v, out, g, lse, scale=scale, kv_len=kv_len,
                           block_b=block_b, interpret=interpret,
                           dropout_rate=rate, seed=seed)
    return dq, dk, dv, _FLOAT0_SEED_COT


_flash_dropout.defvjp(_flash_dropout_vjp_fwd, _flash_dropout_vjp_bwd)


def flash_attention(q, k, v, *, mask=None, interpret=False,
                    dropout_rate: float = 0.0, dropout_rng=None):
    """Fused TPU attention. q: (B,H,Sq,d); k/v: (B,H,Sk,d) -> (B,H,Sq,d).

    `mask` is unsupported here (ViT uses full attention; key padding inside
    the kernel is handled automatically) — callers needing arbitrary masks
    get the jnp reference path.

    dropout_rate/dropout_rng: stateless in-kernel dropout on the softmax
    probabilities (train.py:545 semantics); the backward kernel replays the
    identical mask from the same seed. The bits come from the TPU hardware
    PRNG, not threefry — statistically equivalent to the jnp path, not
    bit-identical to it.
    """
    if mask is not None:
        from arsvt_tpu.ops.attention import sdpa_reference

        return sdpa_reference(q, k, v, mask=mask,
                              dropout_rate=dropout_rate,
                              dropout_rng=dropout_rng)
    kv_len = k.shape[2]
    if dropout_rate > 0.0 and dropout_rng is not None:
        return _flash_dropout(q, k, v, seed_from_rng(dropout_rng), kv_len,
                              float(dropout_rate), interpret)
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


def _packed_fwd_impl(qkv_flat, num_heads, interpret, rate=0.0, seed=None):
    from jax.ad_checkpoint import checkpoint_name

    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    q, k, v = _split_qkv(qkv_flat, num_heads)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    block_b = _pick_block_b(b, s, s)
    out, lse = _fwd(q, k, v, scale=scale, kv_len=s, block_b=block_b,
                    interpret=interpret, dropout_rate=rate, seed=seed)
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    out_bsd = out.transpose(0, 2, 1, 3).reshape(b, s, d)
    return out_bsd, (qkv_flat, out, lse)


def _packed_bwd_impl(saved, g, num_heads, interpret, rate=0.0, seed=None):
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
                           interpret=interpret, dropout_rate=rate, seed=seed)
    dqkv = jnp.stack([dq, dk, dv])  # (3, B, H, S, hd)
    dqkv_flat = dqkv.transpose(1, 3, 0, 2, 4).reshape(b, s, three_d)
    return dqkv_flat.astype(qkv_flat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _packed_nodrop(qkv_flat, num_heads, interpret=False):
    out_bsd, _ = _packed_fwd_impl(qkv_flat, num_heads, interpret)
    return out_bsd


def _packed_vjp_fwd(qkv_flat, num_heads, interpret):
    return _packed_fwd_impl(qkv_flat, num_heads, interpret)


def _packed_vjp_bwd(num_heads, interpret, saved, g):
    return (_packed_bwd_impl(saved, g, num_heads, interpret),)


_packed_nodrop.defvjp(_packed_vjp_fwd, _packed_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _packed_dropout(qkv_flat, seed, num_heads, rate, interpret):
    out_bsd, _ = _packed_fwd_impl(qkv_flat, num_heads, interpret,
                                  rate=rate, seed=seed)
    return out_bsd


def _packed_dropout_vjp_fwd(qkv_flat, seed, num_heads, rate, interpret):
    out_bsd, saved = _packed_fwd_impl(qkv_flat, num_heads, interpret,
                                      rate=rate, seed=seed)
    return out_bsd, (saved, seed)


def _packed_dropout_vjp_bwd(num_heads, rate, interpret, res, g):
    saved, seed = res
    dqkv = _packed_bwd_impl(saved, g, num_heads, interpret,
                            rate=rate, seed=seed)
    return dqkv, _FLOAT0_SEED_COT


_packed_dropout.defvjp(_packed_dropout_vjp_fwd, _packed_dropout_vjp_bwd)


def flash_self_attention_packed(qkv_flat, num_heads, interpret=False,
                                *, dropout_rate: float = 0.0,
                                dropout_rng=None):
    """(B, S, 3D) fused-QKV projection output -> (B, S, D) attention out.

    Optional stateless in-kernel dropout on the softmax probabilities
    (see module docstring) — keeps the residual-lean VJP on the kernel
    path for reference-faithful attn_dropout training (train.py:1352)."""
    if dropout_rate > 0.0 and dropout_rng is not None:
        return _packed_dropout(qkv_flat, seed_from_rng(dropout_rng),
                               num_heads, float(dropout_rate), interpret)
    return _packed_nodrop(qkv_flat, num_heads, interpret)


# ------------------------------------------- direct-layout (transpose-free)
#
# The packed VJP above still *computes* the (B,H,S,d) transposes — it just
# avoids storing them. These kernels skip the transposes entirely: the
# BlockSpec index map carves per-head (bb, S, d) column blocks straight out
# of the (B, S, 3D) projection output (qkv_flat passed three times with
# q/k/v column offsets), and the output is written as (bb, S, d) column
# blocks of a (B, S, D) array that the output projection consumes with no
# relayout. The DMA reads rows of d*2 bytes strided by 3D*2 — whether that
# strided read beats a separate full transpose pass is measured in
# benchmarks/attn_layout_bench.py.


def _fwd_kernel_direct(*refs, scale, head_dim, group, dropout_rate=0.0):
    if dropout_rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    bb = q_ref.shape[0]
    for i in range(bb):  # unrolled over the batch block
        outs = []
        for t in range(group):  # heads within the 128-lane block
            sl = slice(t * head_dim, (t + 1) * head_dim)
            q = q_ref[i, :, sl]  # (S, d) — static 64-lane slice
            k = k_ref[i, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            if dropout_rate > 0.0:
                mixed = ((pl.program_id(0) * bb + i)
                         * pl.num_programs(1)
                         + pl.program_id(1)) * group + t
                pltpu.prng_seed(seed_ref[0], mixed)
                keep = _keep_mask(p.shape, dropout_rate)
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
            o = jax.lax.dot(
                p.astype(v_ref.dtype), v_ref[i, :, sl],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            outs.append((o / l).astype(o_ref.dtype))
            lse_ref[i, t] = (m + jnp.log(l))[:, 0][None, :]
        o_ref[i] = outs[0] if group == 1 else jnp.concatenate(outs, axis=-1)


def _direct_supported(num_heads: int, head_dim: int) -> bool:
    d = num_heads * head_dim
    if head_dim > 128 or 128 % head_dim:
        return False
    return d % 128 == 0


def _direct_specs(b, s, d, num_heads, block_b):
    """Specs carving 128-lane q/k/v column blocks out of (B, S, 3D) and
    128-lane output blocks of (B, S, D). group = heads per 128 lanes."""
    h = num_heads
    hd = d // h
    group = 128 // hd
    n_blocks = d // 128  # per q/k/v region
    qspec = pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(
        (block_b, s, 128), lambda i, j: (i, 0, n_blocks + j),
        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec(
        (block_b, s, 128), lambda i, j: (i, 0, 2 * n_blocks + j),
        memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((block_b, s, 128), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((block_b, group, 1, s), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, vspec, ospec, lspec, group, n_blocks


def _fwd_direct(qkv_flat, num_heads, *, interpret=False,
                dropout_rate=0.0, seed=None):
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    block_b = _pick_block_b(b, s, s)
    qspec, kspec, vspec, ospec, lspec, group, n_blocks = _direct_specs(
        b, s, d, num_heads, block_b)
    in_specs = [qspec, kspec, vspec]
    operands = (qkv_flat, qkv_flat, qkv_flat)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_direct, scale=scale, head_dim=hd,
                          group=group, dropout_rate=dropout_rate),
        grid=(b // block_b, n_blocks),
        in_specs=in_specs,
        out_specs=(ospec, lspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, num_heads, 1, s), jnp.float32),
        ),
        compiler_params=_attn_compiler_params(),
        interpret=interpret,
    )(*operands)
    return out, lse


def _bwd_kernel_direct(*refs, scale, head_dim, group, dropout_rate=0.0):
    if dropout_rate > 0.0:
        (seed_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
         dq_ref, dk_ref, dv_ref) = refs
    bb = q_ref.shape[0]
    for i in range(bb):
        dqs, dks, dvs = [], [], []
        for t in range(group):
            sl = slice(t * head_dim, (t + 1) * head_dim)
            q = q_ref[i, :, sl]
            k = k_ref[i, :, sl]
            v = v_ref[i, :, sl]
            o = o_ref[i, :, sl].astype(jnp.float32)
            do_raw = do_ref[i, :, sl]
            do = do_raw.astype(jnp.float32)
            lse = lse_ref[i, t, 0][:, None]  # (S, 1)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale
            p = jnp.exp(s - lse)

            delta = jnp.sum(o * do, axis=1, keepdims=True)
            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                # replay the forward's per-(cell, item, head) mask
                mixed = ((pl.program_id(0) * bb + i)
                         * pl.num_programs(1)
                         + pl.program_id(1)) * group + t
                pltpu.prng_seed(seed_ref[0], mixed)
                keep = _keep_mask(p.shape, dropout_rate)
                inv_keep = 1.0 / (1.0 - dropout_rate)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
                p_v = jnp.where(keep, p * inv_keep, 0.0)
            else:
                p_v = p
            ds = p * (dp - delta)

            dqs.append((jax.lax.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale).astype(dq_ref.dtype))
            dks.append((jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale).astype(dk_ref.dtype))
            dvs.append(jax.lax.dot_general(
                p_v.astype(do_raw.dtype), do_raw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ).astype(dv_ref.dtype))
        dq_ref[i] = dqs[0] if group == 1 else jnp.concatenate(dqs, axis=-1)
        dk_ref[i] = dks[0] if group == 1 else jnp.concatenate(dks, axis=-1)
        dv_ref[i] = dvs[0] if group == 1 else jnp.concatenate(dvs, axis=-1)


def _bwd_direct(qkv_flat, out, dout, lse, num_heads, *, interpret=False,
                dropout_rate=0.0, seed=None):
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    block_b = _pick_block_b(b, s, s)
    qspec, kspec, vspec, ospec, lspec, group, n_blocks = _direct_specs(
        b, s, d, num_heads, block_b)
    in_specs = [qspec, kspec, vspec, ospec, ospec, lspec]
    operands = (qkv_flat, qkv_flat, qkv_flat, out, dout, lse)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    return pl.pallas_call(
        functools.partial(_bwd_kernel_direct, scale=scale, head_dim=hd,
                          group=group, dropout_rate=dropout_rate),
        grid=(b // block_b, n_blocks),
        in_specs=in_specs,
        out_specs=(ospec, ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
        ),
        compiler_params=_attn_compiler_params(),
        interpret=interpret,
    )(*operands)


# ----------------------------------- save-probs variants (no-remat training)
#
# The no-remat backward's slowest matmuls are the K=64-contraction score
# shapes (8 TF/s structural ceiling, see PERFORMANCE.md "attention
# geometry"). One of them — the QKᵀ score recompute — exists only to
# rebuild P from (q, k, lse). These variants instead WRITE P (normalized,
# bf16) in the forward and read it back in the backward: the backward
# drops the QKᵀ matmul, the exp, and the lse/O operands entirely
# (Δ = rowsum(dP ∘ P) replaces rowsum(dO ∘ O) — the same value by the
# flash identity). Cost: (B,H,S,S) bf16 of HBM per layer (~2.1 GB/step at
# ViT-B bs192) — only worth it when residual memory is already the plan
# (remat_policy="none"); dispatch gates it on ARSVT_ATTN_SAVE_PROBS.


def _fwd_kernel_direct_savep(*refs, scale, head_dim, group,
                             dropout_rate=0.0):
    if dropout_rate > 0.0:
        seed_ref, q_ref, k_ref, v_ref, o_ref, p_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, p_ref = refs
    bb = q_ref.shape[0]
    for i in range(bb):
        outs = []
        for t in range(group):
            sl = slice(t * head_dim, (t + 1) * head_dim)
            q = q_ref[i, :, sl]
            k = k_ref[i, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            p_norm = p / l
            p_ref[i, t] = p_norm.astype(p_ref.dtype)
            if dropout_rate > 0.0:
                mixed = ((pl.program_id(0) * bb + i)
                         * pl.num_programs(1)
                         + pl.program_id(1)) * group + t
                pltpu.prng_seed(seed_ref[0], mixed)
                keep = _keep_mask(p.shape, dropout_rate)
                p_norm = jnp.where(
                    keep, p_norm * (1.0 / (1.0 - dropout_rate)), 0.0)
            o = jax.lax.dot(
                p_norm.astype(v_ref.dtype), v_ref[i, :, sl],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            outs.append(o.astype(o_ref.dtype))
        o_ref[i] = outs[0] if group == 1 else jnp.concatenate(outs, axis=-1)


def _fwd_direct_savep(qkv_flat, num_heads, *, interpret=False,
                      dropout_rate=0.0, seed=None):
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    block_b = _pick_block_b(b, s, s)
    qspec, kspec, vspec, ospec, _, group, n_blocks = _direct_specs(
        b, s, d, num_heads, block_b)
    pspec = pl.BlockSpec((block_b, group, s, s), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kspec, vspec]
    operands = (qkv_flat, qkv_flat, qkv_flat)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    out, probs = pl.pallas_call(
        functools.partial(_fwd_kernel_direct_savep, scale=scale, head_dim=hd,
                          group=group, dropout_rate=dropout_rate),
        grid=(b // block_b, n_blocks),
        in_specs=in_specs,
        out_specs=(ospec, pspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s, s), jnp.bfloat16),
        ),
        compiler_params=_attn_compiler_params(),
        interpret=interpret,
    )(*operands)
    return out, probs


def _bwd_kernel_direct_savep(*refs, scale, head_dim, group,
                             dropout_rate=0.0):
    if dropout_rate > 0.0:
        (seed_ref, q_ref, k_ref, v_ref, p_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, p_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
    bb = q_ref.shape[0]
    for i in range(bb):
        dqs, dks, dvs = [], [], []
        for t in range(group):
            sl = slice(t * head_dim, (t + 1) * head_dim)
            q = q_ref[i, :, sl]
            k = k_ref[i, :, sl]
            v = v_ref[i, :, sl]
            do_raw = do_ref[i, :, sl]
            do = do_raw.astype(jnp.float32)
            p = p_ref[i, t].astype(jnp.float32)  # saved, bf16 -> fp32

            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                mixed = ((pl.program_id(0) * bb + i)
                         * pl.num_programs(1)
                         + pl.program_id(1)) * group + t
                pltpu.prng_seed(seed_ref[0], mixed)
                keep = _keep_mask(p.shape, dropout_rate)
                inv_keep = 1.0 / (1.0 - dropout_rate)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
                p_v = jnp.where(keep, p * inv_keep, 0.0)
            else:
                p_v = p
            # Δ = rowsum(dP ∘ P) == rowsum(dO ∘ O); computed in-register —
            # no O operand, no lse, no QKᵀ recompute
            delta = jnp.sum(dp * p, axis=1, keepdims=True)
            ds = p * (dp - delta)

            dqs.append((jax.lax.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale).astype(dq_ref.dtype))
            dks.append((jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale).astype(dk_ref.dtype))
            dvs.append(jax.lax.dot_general(
                p_v.astype(do_raw.dtype), do_raw, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ).astype(dv_ref.dtype))
        dq_ref[i] = dqs[0] if group == 1 else jnp.concatenate(dqs, axis=-1)
        dk_ref[i] = dks[0] if group == 1 else jnp.concatenate(dks, axis=-1)
        dv_ref[i] = dvs[0] if group == 1 else jnp.concatenate(dvs, axis=-1)


def _bwd_direct_savep(qkv_flat, probs, dout, num_heads, *, interpret=False,
                      dropout_rate=0.0, seed=None):
    b, s, three_d = qkv_flat.shape
    d = three_d // 3
    hd = d // num_heads
    scale = 1.0 / (hd ** 0.5)
    block_b = _pick_block_b(b, s, s)
    qspec, kspec, vspec, ospec, _, group, n_blocks = _direct_specs(
        b, s, d, num_heads, block_b)
    pspec = pl.BlockSpec((block_b, group, s, s), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [qspec, kspec, vspec, pspec, ospec]
    operands = (qkv_flat, qkv_flat, qkv_flat, probs, dout)
    if dropout_rate > 0.0:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        operands = (seed,) + operands
    return pl.pallas_call(
        functools.partial(_bwd_kernel_direct_savep, scale=scale, head_dim=hd,
                          group=group, dropout_rate=dropout_rate),
        grid=(b // block_b, n_blocks),
        in_specs=in_specs,
        out_specs=(ospec, ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
            jax.ShapeDtypeStruct((b, s, d), qkv_flat.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the saved-P tile plus three fp32 temps (p, dp, ds) per
            # unrolled row exceed Mosaic's default 16 MB scoped-VMEM stack
            # at ViT-B shapes (measured 17.19 M at block_b=16); raise the
            # per-kernel limit instead of shrinking the block — the dropout
            # mask seeding must see the same absolute indices as forward
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _enc_attn_savep_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                             interpret, rate=0.0, seed=None):
    qkv = jnp.dot(y, wqkv) + bqkv
    attn, probs = _fwd_direct_savep(qkv, num_heads, interpret=interpret,
                                    dropout_rate=rate, seed=seed)
    out = jnp.dot(attn, wproj) + bproj
    return out, (y, qkv, attn, probs, wqkv, wproj)


def _enc_attn_savep_bwd_impl(saved, g, num_heads, interpret, rate=0.0,
                             seed=None):
    y, qkv, attn, probs, wqkv, wproj = saved
    b, s, d = y.shape
    y2 = y.reshape(b * s, d)
    g2 = g.reshape(b * s, d)
    a2 = attn.reshape(b * s, d)

    dwproj = jnp.dot(a2.T, g2)
    dbproj = jnp.sum(g2, axis=0)
    dattn = jnp.dot(g2, wproj.T).reshape(b, s, d)

    dq, dk, dv = _bwd_direct_savep(qkv, probs, dattn.astype(attn.dtype),
                                   num_heads, interpret=interpret,
                                   dropout_rate=rate, seed=seed)

    wq, wk, wv = wqkv[:, :d], wqkv[:, d:2 * d], wqkv[:, 2 * d:]
    dq2 = dq.reshape(b * s, d)
    dk2 = dk.reshape(b * s, d)
    dv2 = dv.reshape(b * s, d)
    dy = (jnp.dot(dq2, wq.T) + jnp.dot(dk2, wk.T)
          + jnp.dot(dv2, wv.T)).reshape(b, s, d)
    dwqkv = jnp.concatenate(
        [jnp.dot(y2.T, dq2), jnp.dot(y2.T, dk2), jnp.dot(y2.T, dv2)], axis=1
    )
    dbqkv = jnp.concatenate(
        [jnp.sum(dq2, axis=0), jnp.sum(dk2, axis=0), jnp.sum(dv2, axis=0)]
    )
    return (dy.astype(y.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(wqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj.astype(wproj.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _enc_attn_savep_nodrop(y, wqkv, bqkv, wproj, bproj, num_heads,
                           interpret=False):
    out, _ = _enc_attn_savep_fwd_impl(y, wqkv, bqkv, wproj, bproj,
                                      num_heads, interpret)
    return out


def _enc_attn_savep_vjp_fwd(y, wqkv, bqkv, wproj, bproj, num_heads,
                            interpret):
    return _enc_attn_savep_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                                    interpret)


def _enc_attn_savep_vjp_bwd(num_heads, interpret, saved, g):
    return _enc_attn_savep_bwd_impl(saved, g, num_heads, interpret)


_enc_attn_savep_nodrop.defvjp(_enc_attn_savep_vjp_fwd,
                              _enc_attn_savep_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _enc_attn_savep_dropout(y, wqkv, bqkv, wproj, bproj, seed, num_heads,
                            rate, interpret):
    out, _ = _enc_attn_savep_fwd_impl(y, wqkv, bqkv, wproj, bproj,
                                      num_heads, interpret, rate=rate,
                                      seed=seed)
    return out


def _enc_attn_savep_dropout_vjp_fwd(y, wqkv, bqkv, wproj, bproj, seed,
                                    num_heads, rate, interpret):
    out, saved = _enc_attn_savep_fwd_impl(y, wqkv, bqkv, wproj, bproj,
                                          num_heads, interpret, rate=rate,
                                          seed=seed)
    return out, (saved, seed)


def _enc_attn_savep_dropout_vjp_bwd(num_heads, rate, interpret, res, g):
    saved, seed = res
    grads = _enc_attn_savep_bwd_impl(saved, g, num_heads, interpret,
                                     rate=rate, seed=seed)
    return grads + (_FLOAT0_SEED_COT,)


_enc_attn_savep_dropout.defvjp(_enc_attn_savep_dropout_vjp_fwd,
                               _enc_attn_savep_dropout_vjp_bwd)


def fused_encoder_attention_savep(y, wqkv, bqkv, wproj, bproj, num_heads,
                                  interpret=False, *,
                                  dropout_rate: float = 0.0,
                                  dropout_rng=None):
    """fused_encoder_attention with the save-probs backward (see section
    comment): trades (B,H,S,S) bf16 of residual HBM for dropping the QKᵀ
    score recompute, the exp, and the lse/O operands from the backward.
    Same geometry constraints as fused_encoder_attention."""
    _check_enc_attn_geometry(y.shape[-1], num_heads)
    if dropout_rate > 0.0 and dropout_rng is not None:
        return _enc_attn_savep_dropout(y, wqkv, bqkv, wproj, bproj,
                                       seed_from_rng(dropout_rng), num_heads,
                                       float(dropout_rate), interpret)
    return _enc_attn_savep_nodrop(y, wqkv, bqkv, wproj, bproj, num_heads,
                                  interpret)


# -------------------------------------- fused encoder attention (QKV→SDPA→O)
#
# One custom VJP spanning qkv projection → attention → output projection.
# Weights arrive pre-cast to the compute dtype (the caller's .astype VJP
# accumulates the fp32 master-grad exactly as the unfused path does).
# Residuals: (y, qkv_flat, attn_out, lse) — strictly fewer bytes than the
# unfused composition, which additionally saves the attention output in
# (B,H,S,d) layout. Backward never materialises a (B,S,3D) cotangent:
# dy and dW_qkv are computed per-q/k/v against column slices of the weight.


def _enc_attn_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads, interpret,
                       rate=0.0, seed=None):
    from jax.ad_checkpoint import checkpoint_name

    qkv = jnp.dot(y, wqkv) + bqkv
    attn, lse = _fwd_direct(qkv, num_heads, interpret=interpret,
                            dropout_rate=rate, seed=seed)
    attn = checkpoint_name(attn, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    out = jnp.dot(attn, wproj) + bproj
    # weights in the residuals are free — they alias the live params
    return out, (y, qkv, attn, lse, wqkv, wproj)


def _enc_attn_bwd_impl(saved, g, num_heads, interpret, rate=0.0, seed=None):
    y, qkv, attn, lse, wqkv, wproj = saved
    b, s, d = y.shape
    y2 = y.reshape(b * s, d)
    g2 = g.reshape(b * s, d)
    a2 = attn.reshape(b * s, d)

    # output projection
    dwproj = jnp.dot(a2.T, g2)
    dbproj = jnp.sum(g2, axis=0)
    dattn = jnp.dot(g2, wproj.T).reshape(b, s, d)

    # attention core — emits dq/dk/dv as (B,S,D) head-column layouts; no
    # (B,S,3D) cotangent or (B,H,S,d) transpose is ever materialised
    dq, dk, dv = _bwd_direct(qkv, attn, dattn.astype(attn.dtype), lse,
                             num_heads, interpret=interpret,
                             dropout_rate=rate, seed=seed)

    # qkv projection, per column slice of the packed weight
    wq, wk, wv = wqkv[:, :d], wqkv[:, d:2 * d], wqkv[:, 2 * d:]
    dq2 = dq.reshape(b * s, d)
    dk2 = dk.reshape(b * s, d)
    dv2 = dv.reshape(b * s, d)
    dy = (jnp.dot(dq2, wq.T) + jnp.dot(dk2, wk.T)
          + jnp.dot(dv2, wv.T)).reshape(b, s, d)
    dwqkv = jnp.concatenate(
        [jnp.dot(y2.T, dq2), jnp.dot(y2.T, dk2), jnp.dot(y2.T, dv2)], axis=1
    )
    dbqkv = jnp.concatenate(
        [jnp.sum(dq2, axis=0), jnp.sum(dk2, axis=0), jnp.sum(dv2, axis=0)]
    )
    return (dy.astype(y.dtype), dwqkv.astype(wqkv.dtype),
            dbqkv.astype(wqkv.dtype), dwproj.astype(wproj.dtype),
            dbproj.astype(wproj.dtype))


def _check_enc_attn_geometry(d, num_heads):
    if d % num_heads or not _direct_supported(num_heads, d // num_heads):
        raise ValueError(
            f"fused_encoder_attention: unsupported geometry D={d}, "
            f"H={num_heads} (need head_dim dividing 128 and 128 dividing D);"
            " use the qkv/flash path instead"
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _enc_attn_nodrop(y, wqkv, bqkv, wproj, bproj, num_heads,
                     interpret=False):
    out, _ = _enc_attn_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                                interpret)
    return out


def _enc_attn_vjp_fwd(y, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    return _enc_attn_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                              interpret)


def _enc_attn_vjp_bwd(num_heads, interpret, saved, g):
    return _enc_attn_bwd_impl(saved, g, num_heads, interpret)


_enc_attn_nodrop.defvjp(_enc_attn_vjp_fwd, _enc_attn_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _enc_attn_dropout(y, wqkv, bqkv, wproj, bproj, seed, num_heads, rate,
                      interpret):
    out, _ = _enc_attn_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                                interpret, rate=rate, seed=seed)
    return out


def _enc_attn_dropout_vjp_fwd(y, wqkv, bqkv, wproj, bproj, seed, num_heads,
                              rate, interpret):
    out, saved = _enc_attn_fwd_impl(y, wqkv, bqkv, wproj, bproj, num_heads,
                                    interpret, rate=rate, seed=seed)
    return out, (saved, seed)


def _enc_attn_dropout_vjp_bwd(num_heads, rate, interpret, res, g):
    saved, seed = res
    grads = _enc_attn_bwd_impl(saved, g, num_heads, interpret,
                               rate=rate, seed=seed)
    return grads + (_FLOAT0_SEED_COT,)


_enc_attn_dropout.defvjp(_enc_attn_dropout_vjp_fwd, _enc_attn_dropout_vjp_bwd)


def fused_encoder_attention(y, wqkv, bqkv, wproj, bproj, num_heads,
                            interpret=False, *, dropout_rate: float = 0.0,
                            dropout_rng=None):
    """y: (B,S,D); wqkv: (D,3D); wproj: (D,D) — all compute-dtype.

    Returns (B,S,D): out_proj(attention(qkv_proj(y))). Equivalent to the
    unfused qkv-matmul → self_attention_from_qkv → proj-matmul composition
    (tested against it) with transpose-free kernels and leaner residuals.

    Optional stateless in-kernel dropout on the softmax probabilities
    (module docstring) keeps reference-faithful attn_dropout training
    (train.py:528,545,1352) on this fused path.

    Raises ValueError on head geometries the 128-lane column-block kernel
    cannot cover (requires head_dim | 128 and 128 | D) — e.g. the DeiT-400d
    detector's H=8/d=50; dispatch routes those to the transpose path.
    """
    _check_enc_attn_geometry(y.shape[-1], num_heads)
    if dropout_rate > 0.0 and dropout_rng is not None:
        return _enc_attn_dropout(y, wqkv, bqkv, wproj, bproj,
                                 seed_from_rng(dropout_rng), num_heads,
                                 float(dropout_rate), interpret)
    return _enc_attn_nodrop(y, wqkv, bqkv, wproj, bproj, num_heads,
                            interpret)
