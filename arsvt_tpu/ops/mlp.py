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


def gelu_mlp(x, w1, b1, w2, b2, *, force_reference: bool = False):
    """x: (..., D); w1: (D, M); w2: (M, D). Returns (..., D) in x.dtype."""
    if not force_reference and use_fused_mlp():
        from arsvt_tpu.ops.pallas.fused_mlp import fused_gelu_mlp

        return fused_gelu_mlp(x, w1, b1, w2, b2)
    u = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(
        jnp.float32
    )
    # cast the GELU input to the storage dtype BEFORE the activation: XLA's
    # autodiff then saves bf16 residuals (u and h) instead of fp32 — halves
    # the dominant per-layer activation memory at no numerics cost that
    # matters (gelu'(u) in bf16 ulp), making no-remat training reachable.
    u = u.astype(x.dtype)
    h = jax.nn.gelu(u, approximate=True)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )
    return out.astype(x.dtype)
