"""Pallas kernel math vs jnp oracles in interpret mode — default suite.

tests/test_pallas_kernels.py runs the kernels on real TPU hardware but
skips on CPU-only hosts; until round 3 that meant a CPU-only CI executed
ZERO Pallas code and a kernel-math regression could land silently. These
tests run the same fwd+grad parity checks through `interpret=True` at tiny
shapes (seconds on one CPU core), so every host exercises the kernel
control flow and math. Not covered here: the in-kernel dropout paths
(pltpu.prng_seed has no CPU lowering — TPU tests own those) and fused_mlp
(no interpret plumbing; opt-in kernel, TPU-tested).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    # XLA CPU's default matmul precision truncates fp32 operands (~bf16
    # error); parity at 1e-5 needs true fp32 contractions.
    with jax.default_matmul_precision("highest"):
        yield


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_flash_attention_interpret_matches_reference():
    from arsvt_tpu.ops.attention import sdpa_reference
    from arsvt_tpu.ops.pallas.flash_attention import flash_attention

    shape = (2, 3, 197, 16)  # ViT-ish sequence incl. the 197 padding edge
    key = jax.random.PRNGKey(0)
    q = _rand(key, shape)
    k = _rand(jax.random.fold_in(key, 1), shape)
    v = _rand(jax.random.fold_in(key, 2), shape)

    out = flash_attention(q, k, v, interpret=True)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_kernel = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret=True) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(sdpa_reference(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_attention_interpret_matches_reference():
    from arsvt_tpu.ops.attention import sdpa_reference
    from arsvt_tpu.ops.pallas.flash_attention import (
        flash_self_attention_packed,
    )

    b, s, d, h = 1, 64, 48, 3
    key = jax.random.PRNGKey(3)
    qkv = _rand(key, (b, s, 3 * d))

    def ref(qkv_flat):
        q, k, v = jnp.split(qkv_flat, 3, axis=-1)
        split = lambda x: x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)
        o = sdpa_reference(split(q), split(k), split(v))
        return o.transpose(0, 2, 1, 3).reshape(b, s, d)

    out = flash_self_attention_packed(qkv, h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)),
                               atol=2e-5)

    g_kernel = jax.grad(
        lambda x: jnp.sum(
            flash_self_attention_packed(x, h, interpret=True) ** 2
        )
    )(qkv)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               atol=3e-5)


def test_fused_encoder_attention_interpret_matches_unfused():
    from arsvt_tpu.ops.attention import sdpa_reference
    from arsvt_tpu.ops.pallas.flash_attention import fused_encoder_attention

    b, s, d, h = 1, 64, 128, 2  # smallest geometry the direct kernel takes
    key = jax.random.PRNGKey(5)
    y = _rand(key, (b, s, d))
    wqkv = _rand(jax.random.fold_in(key, 1), (d, 3 * d)) * 0.05
    bqkv = _rand(jax.random.fold_in(key, 2), (3 * d,)) * 0.05
    wproj = _rand(jax.random.fold_in(key, 3), (d, d)) * 0.05
    bproj = _rand(jax.random.fold_in(key, 4), (d,)) * 0.05

    def unfused(y, wqkv, bqkv, wproj, bproj):
        qkv = y @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda x: x.reshape(b, s, h, d // h).transpose(0, 2, 1, 3)
        o = sdpa_reference(split(q), split(k), split(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return o @ wproj + bproj

    args = (y, wqkv, bqkv, wproj, bproj)
    out = fused_encoder_attention(*args, h, True)
    ref = unfused(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    g_kernel = jax.grad(
        lambda *a: jnp.sum(fused_encoder_attention(*a, h, True) ** 2),
        argnums=tuple(range(5)),
    )(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(unfused(*a) ** 2), argnums=tuple(range(5))
    )(*args)
    for a_, b_ in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=5e-5)
