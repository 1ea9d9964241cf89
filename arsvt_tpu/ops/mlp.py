"""GELU MLP block math.

Reference: `MLPBlock` (/root/reference/train.py:558-573) — Linear(D→M) →
GELU → Linear(M→D). Both GEMMs hit the MXU; GELU rides the VPU and XLA
fuses it into the first matmul's epilogue. A fully-fused Pallas variant
(`ops/pallas/fused_mlp.py`) keeps the (S, M) intermediate in VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arsvt_tpu.ops.dispatch import use_fused_mlp

_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


@jax.custom_vjp
def gelu_tanh(u):
    """tanh-approx GELU with a compact VJP.

    XLA's autodiff of `jax.nn.gelu` saves ~4 tensor-sized internal
    intermediates (polynomial terms, tanh output) per call — measured 4 x
    3.5 GB per ViT-B step at batch 256. This saves exactly `u` and applies
    the closed-form derivative in backward.
    """
    t = jnp.tanh(_C * (u + _A * u * u * u))
    return 0.5 * u * (1.0 + t)


def _gelu_fwd(u):
    return gelu_tanh(u), u


def _gelu_bwd(u, g):
    uf = u.astype(jnp.float32)
    t = jnp.tanh(_C * (uf + _A * uf * uf * uf))
    d = 0.5 * (1.0 + t) + 0.5 * uf * (1.0 - t * t) * _C * (
        1.0 + 3.0 * _A * uf * uf
    )
    return ((g.astype(jnp.float32) * d).astype(u.dtype),)


gelu_tanh.defvjp(_gelu_fwd, _gelu_bwd)


def gelu_mlp(x, w1, b1, w2, b2, *, force_reference: bool = False,
             remat_tail: bool = False):
    """x: (..., D); w1: (D, M); w2: (M, D). Returns (..., D) in x.dtype.

    remat_tail: wrap only the GELU→fc2 *tail* in
    jax.checkpoint(nothing_saveable). The fc1 output `u` is the tail's
    input, so it is saved; the backward replay recomputes only the
    elementwise gelu(u) (one VPU pass, no matmul) to rebuild fc2's dW
    input. Compared with remat_policy="all_but_mlp" (which recomputes the
    fc1 matmul too, ~2.2 ms/layer of MXU time at ViT-B bs256) this trades
    +310 MB/layer of saved bf16 `u` for dropping that recompute entirely.
    """
    # an explicit remat_tail request wins over the ARSVT_ENABLE_FUSED_MLP
    # opt-in: the fused kernel has its own fixed residual plan (bf16 u)
    # and cannot honor the tail checkpoint or the mlp_u/mlp_h names a
    # remat-tuned recipe depends on — silently swapping memory semantics
    # behind the flag could OOM a tuned step
    if not force_reference and not remat_tail and use_fused_mlp():
        from arsvt_tpu.ops.pallas.fused_mlp import fused_gelu_mlp

        return fused_gelu_mlp(x, w1, b1, w2, b2)
    # both GEMMs emit the storage dtype directly (the MXU accumulates fp32
    # internally either way); with bf16 inputs every saved residual — u, h,
    # the fc2 output — is bf16, not fp32.
    from jax.ad_checkpoint import checkpoint_name

    u = jnp.dot(x, w1) + b1.astype(x.dtype)
    u = checkpoint_name(u, "mlp_u")  # saved under remat_policy="names"

    def tail(u, w2, b2):
        h = gelu_tanh(u)
        # "mlp_h" lets remat_policy="all_but_mlp" drop BOTH (B,S,M)-sized
        # tensors (u for gelu'_bwd, h for fc2's dW) — together ~7.4 GB at
        # ViT-B bs256 — and recompute them with one extra fc1 matmul + gelu
        # per layer in the backward
        h = checkpoint_name(h, "mlp_h")
        return jnp.dot(h, w2) + b2.astype(u.dtype)

    if remat_tail:
        tail = jax.checkpoint(
            tail, policy=jax.checkpoint_policies.nothing_saveable
        )
    return tail(u, w2, b2)
