"""Fused AdamW update — one Pallas pass per parameter leaf.

The optax chain (clip → scale_by_adam → add_decayed_weights →
scale_by_schedule → scale_by_learning_rate → apply_updates) lowers to
several HBM passes over the fp32 master params / moments; at ViT-B scale
that is ~6.5 ms of the train step (PERFORMANCE.md itemization). This kernel
does the whole update — moment EMAs, bias correction, decoupled weight
decay, learning-rate step — in ONE read of (g, m, v, p) and one in-place
write of (p, m, v) per leaf (input/output aliasing), the HBM floor for
AdamW. The reference's optimizer is torch AdamW driven by GradScaler
(/root/reference/train.py:1598-1615); bf16 training needs no loss scaling,
so the fused update is the whole of it.

Semantics are EXACTLY optax's (pinned by tests/test_train_integration.py::
test_fused_adamw_matches_optax): the clip factor, bias corrections and
schedule value are computed outside (cheap scalars) and enter the kernel
via SMEM, so one compiled kernel serves every step. State layout stays the
optax chain's own (`make_optimizer`) — checkpoints interoperate between the
fused and unfused paths in both directions.

Used when `TrainConfig.fused_adamw` is true (see train/optim.py::
fused_adamw_update); leaves whose trailing dim doesn't tile (or tiny ones,
where a kernel launch costs more than it saves) take the identical-math jnp
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# leaves below this many elements use the jnp fallback (launch overhead)
_MIN_KERNEL_ELEMS = 1 << 16


def _adamw_kernel(s_ref, g_ref, m_ref, v_ref, p_ref,
                  po_ref, mo_ref, vo_ref, *, b1, b2, eps, wd):
    gscale = s_ref[0]     # global-norm clip factor
    bc1 = s_ref[1]        # 1 - b1^t  (optax bias_correction divides)
    bc2 = s_ref[2]        # 1 - b2^t
    step = s_ref[3]       # schedule(count) * lr_scale
    g = g_ref[...] * gscale
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * (g * g)
    upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    if wd:
        upd = upd + wd * p_ref[...]
    po_ref[...] = p_ref[...] - step * upd
    mo_ref[...] = m
    vo_ref[...] = v


def _block_rows(rows: int, cols: int) -> int:
    # ~1 MB fp32 per operand block: 4 in + 3 aliased out, double-buffered,
    # must stay inside the raised scoped-VMEM limit below (a 2 MB/operand
    # version measured 16.93 M against Mosaic's 16 M default inside the
    # full train step; the kernel is DMA-bound, small blocks cost nothing)
    br = max(1, min(rows, (1 << 18) // max(cols, 1)))
    while rows % br:
        br -= 1
    return br


@functools.partial(
    jax.jit, static_argnames=("b1", "b2", "eps", "wd", "interpret")
)
def _adamw_leaf_pallas(scalars, g, m, v, p, *, b1, b2, eps, wd,
                       interpret=False):
    orig_shape = p.shape
    cols = orig_shape[-1]
    rows = p.size // cols
    r2 = lambda x: x.reshape(rows, cols)  # noqa: E731
    br = _block_rows(rows, cols)
    spec = pl.BlockSpec((br, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    po, mo, vo = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=(rows // br,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32) for _ in range(3)
        ),
        # update in place: m→m', v→v', p→p' (operand idx includes scalars)
        input_output_aliases={2: 1, 3: 2, 4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, r2(g), r2(m), r2(v), r2(p))
    rs = lambda x: x.reshape(orig_shape)  # noqa: E731
    return rs(po), rs(mo), rs(vo)


def _adamw_leaf_jnp(scalars, g, m, v, p, *, b1, b2, eps, wd):
    """Identical math for leaves the kernel doesn't cover."""
    gscale, bc1, bc2, step = (scalars[i] for i in range(4))
    g = g * gscale
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * (g * g)
    upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    if wd:
        upd = upd + wd * p
    return p - step * upd, m, v


def _kernel_eligible(p) -> bool:
    return (
        p.size >= _MIN_KERNEL_ELEMS
        and p.dtype == jnp.float32
        and p.shape[-1] % 128 == 0
    )


def adamw_leaf(scalars, g, m, v, p, *, b1, b2, eps, wd,
               use_kernel: bool, interpret: bool = False):
    """One leaf's fused update → (p', m', v')."""
    if use_kernel and _kernel_eligible(p):
        return _adamw_leaf_pallas(scalars, g, m, v, p, b1=b1, b2=b2,
                                  eps=eps, wd=wd, interpret=interpret)
    return _adamw_leaf_jnp(scalars, g, m, v, p, b1=b1, b2=b2, eps=eps, wd=wd)
