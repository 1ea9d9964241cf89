"""LayerNorm with fp32 statistics.

Reference: torch `nn.LayerNorm` uses inside pre-LN blocks
(/root/reference/train.py:576-593). Here: stats in fp32 regardless of the
storage dtype (bf16-safe), output cast back to the input dtype. XLA fuses
this into neighbouring ops; a Pallas variant exists for the fused
residual+LN entry of encoder blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, scale, bias, *, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)
