"""LayerNorm with fp32 statistics and a memory-lean custom VJP.

Reference: torch `nn.LayerNorm` inside pre-LN blocks
(/root/reference/train.py:576-593). Stats are computed in fp32 regardless
of storage dtype (bf16-safe), output cast back to the input dtype.

The custom VJP exists for memory, not speed: XLA's autodiff of the naive
formulation saves the fp32 upcast of x (B,S,D) per LayerNorm — ~4 GB/step
at ViT-B batch 256. Here the residuals are the bf16 x plus (mean, rstd)
at (B,S,1) fp32, and the backward uses the closed form
  dx = rstd * (g*γ - mean(g*γ) - x̂ * mean(g*γ*x̂)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ln_fwd_math(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, scale, bias, eps):
    y, _, _ = _ln_fwd_math(x, scale, bias, eps)
    return y


def _ln_vjp_fwd(x, scale, bias, eps):
    y, mean, rstd = _ln_fwd_math(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


def _ln_vjp_bwd(eps, saved, g):
    x, scale, mean, rstd = saved
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    gs = gf * scale.astype(jnp.float32)
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (rstd * (gs - m1 - xhat * m2)).astype(x.dtype)
    axes = tuple(range(g.ndim - 1))
    dscale = jnp.sum(gf * xhat, axis=axes).astype(scale.dtype)
    dbias = jnp.sum(gf, axis=axes).astype(scale.dtype)
    return dx, dscale, dbias


_layer_norm.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


def layer_norm(x, scale, bias, *, eps: float = 1e-5):
    """eps defaults to torch nn.LayerNorm's 1e-5 — the value every
    reference LayerNorm runs with (train.py:576-593 uses the default).
    Converted checkpoints do NOT rely on this default: models/convert.py
    bakes the source model's eps into the imported config (timm ViT 1e-6,
    HF ViT layer_norm_eps) so imports run with their native value."""
    from arsvt_tpu.ops.dispatch import use_ln_vjp

    if use_ln_vjp():
        return _layer_norm(x, scale, bias, eps)
    y, _, _ = _ln_fwd_math(x, scale, bias, eps)  # XLA autodiff path
    return y
