"""Fused-QKV self-attention — transpose-free Pallas TPU kernel.

The generic flash kernel (flash_attention.py) takes (B, H, S, d) tensors,
which forces the model to materialise transposed copies of the packed QKV
projection output (~230 MB per encoder layer per direction at ViT-B batch
256). This kernel reads q/k/v straight out of the projection's natural
(B, S, 3, H*d) layout and writes the output as (B, S, H*d), which the
output projection consumes directly. Zero layout copies end to end.

Kernel shape notes:
  * TPU tiling only allows subdividing the last two dims in (8, 128)
    quanta (pallas_guide.md), so per-head (1, d) blocks are illegal for
    d < 128. The grid is therefore 1-D over batch blocks; ALL heads are
    processed inside the kernel from one (block_b, S, 3, H*d) slab, DMA'd
    exactly once per cell. (A 2-D grid with a j-constant slab index map
    measured 1.6x slower — the slab was re-fetched per head step.)
  * Heads are read in 128-lane groups (g = 128/d heads at a time) because
    Mosaic requires dynamic lane offsets provably 128-aligned; heads are
    split from the loaded group by static slicing.
  * Math matches flash_attention.py: single-shot fused softmax in VMEM,
    fp32 statistics, logsumexp residual; fully-Pallas backward emits the
    packed (B, S, 3, H*d) dQKV in one kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_group(d: int) -> int:
    return max(1, 128 // d)


def _pick_block_b(b: int, s: int, hd: int) -> int:
    # slab + out + do + dqkv must fit VMEM with double buffering; keep the
    # bf16 slab (s * 3*hd * 2 bytes per item) around 2 MB.
    budget = 2 * 1024 * 1024
    per_item = s * 3 * hd * 2
    bb = max(1, budget // max(per_item, 1))
    while b % bb:
        bb -= 1
    return bb


# ------------------------------------------------------------------ forward


def _fwd_kernel(qkv_ref, o_ref, lse_ref, *, scale, num_heads, head_dim,
                group):
    bb = qkv_ref.shape[0]
    lanes = group * head_dim  # 128, or head_dim when >= 128
    n_groups = num_heads // group
    for i in range(bb):
        for jg in range(n_groups):
            off = jg * lanes
            qg = qkv_ref[i, :, 0, off:off + lanes]
            kg = qkv_ref[i, :, 1, off:off + lanes]
            vg = qkv_ref[i, :, 2, off:off + lanes]
            outs = []
            for t in range(group):
                sl = slice(t * head_dim, (t + 1) * head_dim)
                q, k, v = qg[:, sl], kg[:, sl], vg[:, sl]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                ) * scale
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=1, keepdims=True)
                o = jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                outs.append((o / l).astype(o_ref.dtype))
                lse_ref[i, jg * group + t] = jnp.broadcast_to(
                    (m + jnp.log(l))[:, 0][None, :], (8, q.shape[0])
                )
            o_ref[i, :, off:off + lanes] = jnp.concatenate(outs, axis=-1)


def _specs(s, hd, num_heads, bb):
    slab = pl.BlockSpec((bb, s, 3, hd), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.BlockSpec((bb, s, hd), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((bb, num_heads, 8, s), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return slab, out, lse


def _fwd(qkv, num_heads):
    b, s, three, hd = qkv.shape
    head_dim = hd // num_heads
    group = _head_group(head_dim)
    bb = _pick_block_b(b, s, hd)
    slab, outspec, lsespec = _specs(s, hd, num_heads, bb)
    scale = 1.0 / (head_dim ** 0.5)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads,
                          head_dim=head_dim, group=group),
        grid=(b // bb,),
        in_specs=[slab],
        out_specs=(outspec, lsespec),
        out_shape=(
            jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, 8, s), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv)
    return out, lse


# ----------------------------------------------------------------- backward


def _bwd_kernel(qkv_ref, o_ref, do_ref, lse_ref, dqkv_ref,
                *, scale, num_heads, head_dim, group):
    bb = qkv_ref.shape[0]
    lanes = group * head_dim
    n_groups = num_heads // group
    for i in range(bb):
        for jg in range(n_groups):
            off = jg * lanes
            qg = qkv_ref[i, :, 0, off:off + lanes]
            kg = qkv_ref[i, :, 1, off:off + lanes]
            vg = qkv_ref[i, :, 2, off:off + lanes]
            og = o_ref[i, :, off:off + lanes]
            dog = do_ref[i, :, off:off + lanes]
            dqs, dks, dvs = [], [], []
            for t in range(group):
                sl = slice(t * head_dim, (t + 1) * head_dim)
                q, k, v = qg[:, sl], kg[:, sl], vg[:, sl]
                o = og[:, sl].astype(jnp.float32)
                do = dog[:, sl]
                dof = do.astype(jnp.float32)
                lse = lse_ref[i, jg * group + t, 0][:, None]

                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                ) * scale
                p = jnp.exp(s - lse)
                delta = jnp.sum(o * dof, axis=1, keepdims=True)
                dp = jax.lax.dot_general(
                    dof, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                )
                ds = p * (dp - delta)
                dqs.append((jax.lax.dot(
                    ds.astype(k.dtype), k,
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                ) * scale).astype(dqkv_ref.dtype))
                dks.append((jax.lax.dot_general(
                    ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                ) * scale).astype(dqkv_ref.dtype))
                dvs.append(jax.lax.dot_general(
                    p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
                ).astype(dqkv_ref.dtype))
            dqkv_ref[i, :, 0, off:off + lanes] = jnp.concatenate(dqs, -1)
            dqkv_ref[i, :, 1, off:off + lanes] = jnp.concatenate(dks, -1)
            dqkv_ref[i, :, 2, off:off + lanes] = jnp.concatenate(dvs, -1)


def _bwd_call(qkv, out, do, lse, num_heads):
    b, s, three, hd = qkv.shape
    head_dim = hd // num_heads
    group = _head_group(head_dim)
    bb = _pick_block_b(b, s, hd)
    slab, outspec, lsespec = _specs(s, hd, num_heads, bb)
    scale = 1.0 / (head_dim ** 0.5)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads,
                          head_dim=head_dim, group=group),
        grid=(b // bb,),
        in_specs=[slab, outspec, outspec, lsespec],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, s, 3, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(qkv, out, do, lse)


# ---------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _qkv_attention(qkv, num_heads):
    out, _ = _fwd(qkv, num_heads)
    return out


def _vjp_fwd(qkv, num_heads):
    out, lse = _fwd(qkv, num_heads)
    return out, (qkv, out, lse)


def _vjp_bwd(num_heads, saved, g):
    qkv, out, lse = saved
    return (_bwd_call(qkv, out, g, lse, num_heads),)


_qkv_attention.defvjp(_vjp_fwd, _vjp_bwd)


def fused_qkv_self_attention(qkv, num_heads: int):
    """qkv: (B, S, 3, H*d) packed projection output -> (B, S, H*d).

    Self-attention only (Sq == Sk, no mask); requires H divisible by the
    128/d head group. Cross-attention uses flash_attention.py.
    """
    return _qkv_attention(qkv, num_heads)


def supported(num_heads: int, head_dim: int) -> bool:
    g = _head_group(head_dim)
    return num_heads % g == 0 and head_dim <= 128
