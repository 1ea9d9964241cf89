"""Gradient accumulation: one optimizer step over `accum` microbatches.

The reference cannot express large effective batches at all (single GPU,
fixed bs32 — train.py:1356); here `TrainConfig.grad_accum = k` splits the
global batch into k microbatches inside the SAME jitted step via
`lax.scan`, so a bs512 recipe fits one chip's HBM at bs512/k activation
footprint. The math is exactly the full-batch step: per-microbatch mean
losses/grads averaged over equal-size microbatches equal the global mean
(pinned by test against the accum=1 step).

Microbatch layout: `(B, ...) -> (B/k, k, ...)` row-major, microbatch `a`
= rows `a::k`. Under a data-parallel mesh this reshape is local to every
device (each device's contiguous rows land in a contiguous dim-0 range),
so no resharding collective is inserted — the sharding constraint below
pins that.

Estimator notes (exact for classification; approximations for detect):
detection losses normalize by the *microbatch's* matched-box count, so
accumulated detection gradients equal the full-batch ones only when box
counts are uniform (the equivalence test constructs that case); and
batch-hard triplet mining pools within a microbatch, not the global
batch. Both match the semantics of sequential-step accumulation in other
frameworks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from arsvt_tpu.parallel.sharding import DATA_AXIS


def microbatch_split(batch, accum: int, mesh=None):
    """Batch pytree with leading dim B -> leading dims (B/accum, accum)."""

    def split(x):
        if x.ndim < 1 or x.shape[0] % accum:
            raise ValueError(
                f"grad_accum={accum} must divide the batch dim, "
                f"got shape {x.shape}"
            )
        y = x.reshape(x.shape[0] // accum, accum, *x.shape[1:])
        if mesh is not None and mesh.shape.get(DATA_AXIS, 1) > 1:
            y = jax.lax.with_sharding_constraint(
                y,
                NamedSharding(mesh, P(DATA_AXIS, *([None] * (y.ndim - 1)))),
            )
        return y

    return jax.tree.map(split, batch)


def accumulated_value_and_grad(loss_fn, params, batch, rng, accum: int,
                               mesh=None):
    """`value_and_grad(loss_fn, has_aux=True)` over `accum` microbatches.

    loss_fn(params, microbatch, rng) -> (loss, aux_dict). Returns the
    same ((loss, aux), grads) structure with every inexact leaf averaged
    over microbatches; the per-microbatch rng is `fold_in(rng, a)`.
    """
    if accum <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)

    micro = microbatch_split(batch, accum, mesh)

    def one(a):
        mb = jax.tree.map(lambda x: x[:, a], micro)
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, jax.random.fold_in(rng, a)
        )

    shapes = jax.eval_shape(one, jnp.zeros((), jnp.int32))
    init = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def body(carry, a):
        return jax.tree.map(jnp.add, carry, one(a)), None

    total, _ = jax.lax.scan(body, init, jnp.arange(accum, dtype=jnp.int32))
    return jax.tree.map(
        lambda x: x / accum if jnp.issubdtype(x.dtype, jnp.inexact) else x,
        total,
    )
