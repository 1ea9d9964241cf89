"""Fused GELU MLP — Pallas TPU kernels with custom VJP.

Memory story (measured, ViT-B batch 256): XLA's autodiff saves the fp32
(B·S, mlp_dim) GELU input per layer — ~41 GB over a 12-layer scan, forcing
full-graph rematerialisation. A first version of this kernel saved only x
and recomputed the hidden in backward; that costs +2 matmuls/layer and
measured 15% slower end-to-end under remat. This version:

  forward:  out = gelu(x @ w1 + b1) @ w2 + b2 with the hidden kept in VMEM
            (never written to HBM as fp32); additionally emits the
            pre-activation u as a *bf16* residual (2.5x smaller than XLA's
            fp32 save, 1.9 GB/step at ViT-B bs256).
  backward: zero recompute matmuls — FLOP-identical to XLA-with-saved-h:
            dx kernel:  dh = do @ w2ᵀ, du = dh ∘ gelu'(u), dx = du @ w1ᵀ
                        (accumulated over M blocks; also emits du bf16)
            dw kernel:  h = gelu(u) (elementwise), dw1 = xᵀ@du,
                        db1 = Σdu, dw2 = hᵀ@do (accumulated over rows)

Replaces /root/reference/train.py:558-573's MLPBlock compute path. The
tanh GELU matches `ops.mlp.gelu_mlp` within bf16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


def _gelu(u):
    t = jnp.tanh(_C * (u + _A * u * u * u))
    return 0.5 * u * (1.0 + t)


def _gelu_grad(u):
    t = jnp.tanh(_C * (u + _A * u * u * u))
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _C * (
        1.0 + 3.0 * _A * u * u
    )


def _pick_block(n: int, target: int, quantum: int) -> int:
    """Largest divisor of n that is <= target and a multiple of quantum,
    else n itself (block == array dim is always legal)."""
    best = n
    b = (target // quantum) * quantum
    while b >= quantum:
        if n % b == 0:
            return b
        b -= quantum
    return best


# ------------------------------------------------------------------ forward


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, u_ref,
                acc_ref, *, n_m):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = (
        jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        + b1_ref[0].astype(jnp.float32)
    )
    u_ref[...] = u.astype(u_ref.dtype)
    h = _gelu(u)
    acc_ref[...] += jnp.dot(
        h.astype(x_ref.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(m == n_m - 1)
    def _():
        o_ref[...] = (
            acc_ref[...] + b2_ref[0].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _fwd(x2d, w1, b1, w2, b2):
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)
    n, d = x2d.shape
    mdim = w1.shape[1]
    bn = _pick_block(n, 512, 8)
    bm = _pick_block(mdim, 512, 128)
    n_m = mdim // bm
    grid = (n // bn, n_m)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_m=n_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda i, m: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, m: (0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, d), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bm), lambda i, m: (i, m),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2d.dtype),
            jax.ShapeDtypeStruct((n, mdim), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d, w1, b1, w2, b2)


# ----------------------------------------------------- backward: dx kernel


def _bwd_dx_kernel(u_ref, w1_ref, w2_ref, do_ref, dx_ref, du_ref, acc_ref,
                   *, n_m):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dh = jax.lax.dot_general(
        do_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )  # (bn, bm) = do @ w2^T
    du = dh * _gelu_grad(u_ref[...].astype(jnp.float32))
    du_bf = du.astype(du_ref.dtype)
    du_ref[...] = du_bf
    acc_ref[...] += jax.lax.dot_general(
        du_bf, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )  # du @ w1^T

    @pl.when(m == n_m - 1)
    def _():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


# ------------------------------------------------ backward: dw/db kernel


def _bwd_dw_kernel(x_ref, u_ref, du_ref, do_ref,
                   dw1_ref, db1_ref, dw2_ref, dw1_acc, db1_acc, dw2_acc,
                   *, n_r):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)

    du = du_ref[...]
    h = _gelu(u_ref[...].astype(jnp.float32)).astype(do_ref.dtype)
    dw1_acc[...] += jax.lax.dot_general(
        x_ref[...], du, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )  # x^T @ du
    db1_acc[...] += jnp.sum(
        du.astype(jnp.float32), axis=0, keepdims=True
    )
    dw2_acc[...] += jax.lax.dot_general(
        h, do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
    )  # h^T @ do

    @pl.when(r == n_r - 1)
    def _():
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)
        dw2_ref[...] = dw2_acc[...].astype(dw2_ref.dtype)


def _bwd(x2d, u, w1, w2, do2d):
    n, d = x2d.shape
    mdim = w1.shape[1]
    bn = _pick_block(n, 512, 8)
    bm = _pick_block(mdim, 512, 128)
    n_m, n_r = mdim // bm, n // bn

    dx, du = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, n_m=n_m),
        grid=(n_r, n_m),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda i, m: (i, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda i, m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, m: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, d), lambda i, m: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bm), lambda i, m: (i, m),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2d.dtype),
            jax.ShapeDtypeStruct((n, mdim), jnp.bfloat16),
        ),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(u, w1, w2, do2d)

    dw1, db1, dw2 = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, n_r=n_r),
        grid=(n_m, n_r),
        in_specs=[
            pl.BlockSpec((bn, d), lambda m, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bm), lambda m, i: (i, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bm), lambda m, i: (i, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda m, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, bm), lambda m, i: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda m, i: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda m, i: (m, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, mdim), jnp.float32),
            jax.ShapeDtypeStruct((1, mdim), jnp.float32),
            jax.ShapeDtypeStruct((mdim, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, bm), jnp.float32),
            pltpu.VMEM((1, bm), jnp.float32),
            pltpu.VMEM((bm, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d, u, du, do2d)
    return dx, dw1, db1, dw2


# ---------------------------------------------------------------- public op


@jax.custom_vjp
def _fused_mlp(x2d, w1, b1, w2, b2):
    out, _ = _fwd(x2d, w1, b1, w2, b2)
    return out


def _vjp_fwd(x2d, w1, b1, w2, b2):
    out, u = _fwd(x2d, w1, b1, w2, b2)
    return out, (x2d, u, w1, b1, b2, w2)


def _vjp_bwd(saved, g):
    x2d, u, w1, b1, b2, w2 = saved
    dx, dw1, db1, dw2 = _bwd(x2d, u, w1, w2, g)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


_fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def fused_gelu_mlp(x, w1, b1, w2, b2):
    """x: (..., D); w1: (D, M); w2: (M, D) -> (..., D) in x.dtype."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_mlp(x2d, w1, b1, w2, b2)
    return out.reshape(shape)
