"""Fused GELU MLP — Pallas TPU kernels with custom VJP.

The measured ViT-B memory killer (SURVEY.md §7 "bf16 numerics" corollary):
XLA's autodiff saves the fp32 (B, S, mlp_dim) GELU input per layer — stacked
over a 12-layer scan that is ~17 GB at batch 256 and forces full-graph
rematerialisation. This kernel:

  forward:  out = gelu(x @ w1 + b1) @ w2 + b2 with the (rows, M) hidden kept
            in VMEM only — never written to HBM; grid (row-blocks, M-blocks)
            accumulating into the output block across M (sequential inner
            grid dim, init at m==0).
  backward: saves ONLY x (+ the weights) and recomputes the hidden:
            two kernels because the two accumulations run over different
            grid axes (dx sums over M blocks, dw/db over row blocks) and
            TPU output revisiting must be over consecutive iterations.

Matches `ops.mlp.gelu_mlp` (tanh-approx GELU, fp32 accumulation islands)
within bf16 tolerance; replaces /root/reference/train.py:558-573's MLPBlock
compute path.
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


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref,
                *, n_m):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = (
        jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0].astype(jnp.float32)
    )
    h = _gelu(u)
    acc_ref[...] += jnp.dot(
        h.astype(x_ref.dtype), w2_ref[...],
        preferred_element_type=jnp.float32,
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
        out_specs=pl.BlockSpec((bn, d), lambda i, m: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d, w1, b1, w2, b2)


# ----------------------------------------------------- backward: dx kernel


def _bwd_dx_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref, dx_ref, acc_ref,
                   *, n_m):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u = (
        jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0].astype(jnp.float32)
    )
    dh = jax.lax.dot_general(
        do_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bn, bm) = do @ w2^T
    du = dh * _gelu_grad(u)
    acc_ref[...] += jax.lax.dot_general(
        du.astype(x_ref.dtype), w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # du @ w1^T

    @pl.when(m == n_m - 1)
    def _():
        dx_ref[...] = acc_ref[...].astype(dx_ref.dtype)


# ------------------------------------------------ backward: dw/db kernels


def _bwd_dw_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                   dw1_ref, db1_ref, dw2_ref, dw1_acc, db1_acc, dw2_acc,
                   *, n_r):
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dw1_acc[...] = jnp.zeros_like(dw1_acc)
        db1_acc[...] = jnp.zeros_like(db1_acc)
        dw2_acc[...] = jnp.zeros_like(dw2_acc)

    u = (
        jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0].astype(jnp.float32)
    )
    h = _gelu(u)
    dh = jax.lax.dot_general(
        do_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = dh * _gelu_grad(u)
    dw1_acc[...] += jax.lax.dot_general(
        x_ref[...], du.astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # x^T @ du
    db1_acc[...] += jnp.sum(du, axis=0, keepdims=True)
    dw2_acc[...] += jax.lax.dot_general(
        h.astype(do_ref.dtype), do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # h^T @ do

    @pl.when(r == n_r - 1)
    def _():
        dw1_ref[...] = dw1_acc[...].astype(dw1_ref.dtype)
        db1_ref[...] = db1_acc[...].astype(db1_ref.dtype)
        dw2_ref[...] = dw2_acc[...].astype(dw2_ref.dtype)


def _bwd(x2d, w1, b1, w2, do2d):
    b1 = b1.reshape(1, -1)
    n, d = x2d.shape
    mdim = w1.shape[1]
    bn = _pick_block(n, 512, 8)
    bm = _pick_block(mdim, 512, 128)
    n_m, n_r = mdim // bm, n // bn

    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, n_m=n_m),
        grid=(n_r, n_m),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, m: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda i, m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, m: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i, m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, m: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, m: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bn, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2d, w1, b1, w2, do2d)

    dw1, db1, dw2 = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, n_r=n_r),
        grid=(n_m, n_r),
        in_specs=[
            pl.BlockSpec((bn, d), lambda m, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bm), lambda m, i: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda m, i: (0, m), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda m, i: (m, 0), memory_space=pltpu.VMEM),
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
    )(x2d, w1, b1, w2, do2d)
    return dx, dw1, db1, dw2


# ---------------------------------------------------------------- public op


@jax.custom_vjp
def _fused_mlp(x2d, w1, b1, w2, b2):
    return _fwd(x2d, w1, b1, w2, b2)


def _vjp_fwd(x2d, w1, b1, w2, b2):
    return _fwd(x2d, w1, b1, w2, b2), (x2d, w1, b1, w2)


def _vjp_bwd(saved, g):
    x2d, w1, b1, w2 = saved
    dx, dw1, db1, dw2 = _bwd(x2d, w1, b1, w2, g)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b1.dtype),
    )


_fused_mlp.defvjp(_vjp_fwd, _vjp_bwd)


def fused_gelu_mlp(x, w1, b1, w2, b2):
    """x: (..., D); w1: (D, M); w2: (M, D) -> (..., D) in x.dtype."""
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_mlp(x2d, w1, b1, w2, b2)
    return out.reshape(shape)
