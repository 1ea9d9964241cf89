"""Int8 W8A8 inference primitives (AQT-style dynamic quantization).

TPU v5e's MXU runs s8 x s8 -> s32 matmuls at 2x the bf16 rate (394 INT8
TOPS vs 197 bf16 TFLOP/s), and int8 weights halve the HBM traffic of every
weight read. This module provides the two primitives the quantized
inference path (models/quantized.py) is built from:

  * `quantize_weight` — offline per-output-channel symmetric int8: one
    fp32 scale per output column, computed once at model-load time.
  * `quant_dense`    — runtime per-token symmetric activation quant +
    `jnp.dot(int8, int8, preferred_element_type=int32)` (XLA lowers this
    straight onto the MXU int8 path) + fp32 dequant by the outer product
    of the two scales, + bias.

Quantization is symmetric (zero-point-free) on both sides: TPU has no
zero-point fixup unit, and asymmetric quant would turn the single MXU pass
into matmul + two correction terms. Per-token activation scales (one
max-abs reduce per row, fused by XLA into the surrounding elementwise
work) keep accuracy within noise for post-LN ViT activations without any
calibration data.

This is an inference-only surface — training stays bf16/fp32 (the
reference has no quantized path at all; this is a beyond-parity serving
feature). The eval oracle for tests is the fp32 `jnp.dot` of the
dequantized operands.
"""

from __future__ import annotations

import jax.numpy as jnp

# int8 symmetric range: +-127 (not -128) so negation stays in range
_QMAX = 127.0
_EPS = 1e-8


def quantize_weight(w, *, axis: int = -2):
    """Per-output-channel symmetric int8 quantization of a dense kernel.

    `w` is an (..., in, out) matmul kernel (possibly with leading stacked-
    depth axes); `axis` is the contraction (input) dimension, reduced away
    in the scale. Returns `{"q": int8 same-shape, "scale": fp32 w/out the
    contraction dim}` with `q * scale ~= w`.
    """
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / _QMAX
    q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return {"q": q, "scale": jnp.squeeze(scale, axis=axis)}


def quantize_activation(x):
    """Per-token (last-dim) symmetric int8: (..., D) -> (int8 x, fp32
    per-row scale (..., 1))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / _QMAX
    q = jnp.clip(jnp.round(xf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return q, scale


def quant_dense(x, qw: dict, bias=None, *, out_dtype=None):
    """W8A8 dense: x (..., in) x qw {"q": (in, out) int8, "scale": (out,)}.

    The s8 x s8 contraction accumulates in int32 on the MXU; dequant is one
    fp32 multiply by `row_scale * col_scale` (rank-1, fused by XLA into the
    epilogue). Returns (..., out) in `out_dtype` (default: x.dtype).
    """
    out_dtype = out_dtype or x.dtype
    qx, x_scale = quantize_activation(x)
    acc = jnp.dot(qx, qw["q"], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale * qw["scale"].astype(jnp.float32))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def dequantize_weight(qw: dict, *, axis: int = -2):
    """Inverse of `quantize_weight` (test oracle / fallback path)."""
    scale = jnp.expand_dims(qw["scale"], axis)
    return qw["q"].astype(jnp.float32) * scale
