"""Backend dispatch: Pallas TPU kernels vs. pure-jnp references.

Every compute op in `arsvt_tpu.ops` has a pure-jnp reference implementation
(the numerics oracle for tests) and, where fusion pays, a Pallas TPU kernel.
Kernels are used automatically on TPU backends; `ARSVT_DISABLE_PALLAS=1`
forces the jnp path everywhere (e.g. for CPU-mesh distributed tests), and
`ARSVT_FORCE_PALLAS=1` forces kernels (interpret mode off-TPU is too slow to
be a sensible default).
"""

from __future__ import annotations

import os

import jax


def use_pallas() -> bool:
    if os.environ.get("ARSVT_DISABLE_PALLAS"):
        return False
    if os.environ.get("ARSVT_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def use_fused_mlp() -> bool:
    """Opt-in (ARSVT_ENABLE_FUSED_MLP=1): measured end-to-end, XLA's MLP
    lowering beats the fused kernel under rematerialisation (629 vs 545
    img/s, ViT-B bs256) — the kernel's win is memory (bf16 residuals,
    enables no-remat) which only pays once batch sizes fit; see
    benchmarks/ and ops/pallas/fused_mlp.py."""
    return use_pallas() and bool(os.environ.get("ARSVT_ENABLE_FUSED_MLP"))


def use_ln_vjp() -> bool:
    return not os.environ.get("ARSVT_DISABLE_LN_VJP")


def use_attn_save_probs() -> bool:
    """Opt-in (ARSVT_ATTN_SAVE_PROBS=1): the fused encoder attention saves
    the normalized bf16 probabilities as a residual so the backward drops
    the K=64 QKᵀ score recompute, the exp and the lse/O operands — worth
    (B,H,S,S) bf16 of HBM only under remat_policy="none" (see
    ops/pallas/flash_attention.py save-probs section + PERFORMANCE.md)."""
    return use_pallas() and bool(os.environ.get("ARSVT_ATTN_SAVE_PROBS"))


def force_jnp_attention() -> bool:
    """Opt-in (ARSVT_ATTN_JNP=1): route multi-head attention through the
    jnp sdpa path even on TPU. Measurement toggle for geometries where
    the per-(batch-block, head) flash grid is overhead-bound rather than
    MXU-bound — e.g. the reference detector's head_dim=16 (25 heads of 16
    occupy a full 128-lane tile each, so the kernel's score matmuls run at
    1/8 MXU utilization either way and XLA's batched-matmul lowering can
    win on dispatch overhead; benchmarks/detector_profile.py A/Bs this).
    """
    return bool(os.environ.get("ARSVT_ATTN_JNP"))


def use_fused_encoder_attention(num_heads: int, head_dim: int) -> bool:
    """Direct-layout fused qkv-proj→attention→out-proj block: reads per-head
    column blocks straight from the (B,S,3D) projection output — zero HBM
    transposes (measured −62 ms/step at ViT-B bs256,
    benchmarks/attn_layout_bench.py). Requires 128 % head_dim == 0 and
    D % 128 == 0 (BlockSpec lane-tiling); other geometries (e.g. the
    reference's 400-dim DeiT) use the packed VJP path."""
    if os.environ.get("ARSVT_DISABLE_FUSED_ATTN"):
        return False
    if not use_pallas() or force_jnp_attention():
        return False
    from arsvt_tpu.ops.pallas.flash_attention import _direct_supported

    return _direct_supported(num_heads, head_dim)
