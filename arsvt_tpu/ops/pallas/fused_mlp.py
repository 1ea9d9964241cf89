"""Fused GELU MLP — Pallas TPU kernel (placeholder: jnp for now)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_gelu_mlp(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return out.astype(x.dtype)
