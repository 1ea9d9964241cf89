"""Pallas kernel vs jnp-reference numerics — runs on any TPU host.

SURVEY.md §4 "Numerics": every kernel has a pure-jnp oracle; these compare
fwd and grads at bf16 tolerance on the actual hardware. On CPU-only hosts
they skip (interpret mode is too slow to be useful); wherever a TPU backend
exists they are part of the default suite (the persistent compile cache
makes warm reruns cheap).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Kernel parity is UN-SKIPPABLE wherever a TPU backend exists (VERDICT
# round-2 #7: a kernel regression must not reach bench.py undetected). The
# `tpu` marker makes conftest skip these only on CPU-only hosts;
# ARSVT_SKIP_TPU_KERNEL_TESTS=1 is an explicit escape hatch for debugging.
pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        bool(os.environ.get("ARSVT_SKIP_TPU_KERNEL_TESTS")),
        reason="explicitly skipped via ARSVT_SKIP_TPU_KERNEL_TESTS",
    ),
]


@pytest.fixture(scope="module")
def tpu_device():
    return jax.devices("tpu")[0] if jax.default_backend() == "tpu" else None


@pytest.fixture(autouse=True)
def _run_on_tpu():
    """conftest pins jax_default_device to CPU (the virtual 8-device mesh);
    every test in this module must lower Pallas for the real TPU instead."""
    if jax.default_backend() == "tpu":
        with jax.default_device(jax.devices("tpu")[0]):
            yield
    else:
        yield


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("shape", [(4, 12, 197, 64), (2, 25, 198, 16)])
def test_flash_attention_matches_reference(shape):
    from arsvt_tpu.ops.attention import sdpa_reference
    from arsvt_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = _rand(key, shape)
    k = _rand(jax.random.fold_in(key, 1), shape)
    v = _rand(jax.random.fold_in(key, 2), shape)
    with jax.default_device(jax.devices("tpu")[0]):
        out = jax.jit(lambda *a: flash_attention(*a))(q, k, v)
        ref = sdpa_reference(q, k, v)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
        assert err.max() < 2e-2  # bf16 tolerance

        g1 = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))(q, k, v)
        g2 = jax.grad(
            lambda q, k, v: jnp.sum(sdpa_reference(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 2e-2


def test_fused_mlp_matches_reference():
    from arsvt_tpu.ops.mlp import gelu_mlp
    from arsvt_tpu.ops.pallas.fused_mlp import fused_gelu_mlp

    key = jax.random.PRNGKey(1)
    n, d, m = 1576, 256, 512
    x = _rand(key, (n, d))
    w1 = (_rand(jax.random.fold_in(key, 1), (d, m), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b1 = jnp.zeros((m,), jnp.float32)
    w2 = (_rand(jax.random.fold_in(key, 2), (m, d), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b2 = jnp.zeros((d,), jnp.float32)
    with jax.default_device(jax.devices("tpu")[0]):
        out = jax.jit(fused_gelu_mlp)(x, w1, b1, w2, b2)
        ref = gelu_mlp(x, w1, b1, w2, b2, force_reference=True)
        rel = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
        rel /= np.abs(np.asarray(ref, np.float32)).max()
        assert rel < 2e-2

        g1 = jax.jit(jax.grad(
            lambda *a: jnp.sum(fused_gelu_mlp(*a).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4)))(x, w1, b1, w2, b2)
        g2 = jax.jit(jax.grad(
            lambda *a: jnp.sum(gelu_mlp(*a, force_reference=True).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2, 3, 4)))(x, w1, b1, w2, b2)
        for a, b in zip(g1, g2):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 3e-2


def test_fused_encoder_attention_matches_unfused():
    """fused_encoder_attention (direct-layout qkv→SDPA→proj custom VJP) vs
    the unfused qkv-matmul → packed-flash → proj-matmul composition: forward
    and grads wrt input + all four weight/bias tensors."""
    from arsvt_tpu.ops.pallas.flash_attention import (
        flash_self_attention_packed,
        fused_encoder_attention,
    )

    b, s, d, h = 4, 197, 768, 12
    key = jax.random.PRNGKey(7)
    y = _rand(key, (b, s, d))
    wqkv = (_rand(jax.random.fold_in(key, 1), (d, 3 * d), jnp.float32)
            * 0.05).astype(jnp.bfloat16)
    bqkv = _rand(jax.random.fold_in(key, 2), (3 * d,)) * 0.1
    wproj = (_rand(jax.random.fold_in(key, 3), (d, d), jnp.float32)
             * 0.05).astype(jnp.bfloat16)
    bproj = _rand(jax.random.fold_in(key, 4), (d,)) * 0.1

    def unfused(y, wqkv, bqkv, wproj, bproj):
        qkv = jnp.dot(y, wqkv) + bqkv
        attn = flash_self_attention_packed(qkv, h)
        return jnp.dot(attn, wproj) + bproj

    def fused(y, wqkv, bqkv, wproj, bproj):
        return fused_encoder_attention(y, wqkv, bqkv, wproj, bproj, h)

    args = (y, wqkv, bqkv, wproj, bproj)
    with jax.default_device(jax.devices("tpu")[0]):
        out = jax.jit(fused)(*args)
        ref = jax.jit(unfused)(*args)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
        assert err.max() < 2e-2

        loss = lambda f: lambda *a: jnp.sum(  # noqa: E731
            f(*a).astype(jnp.float32) ** 2)
        g1 = jax.jit(jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4)))(*args)
        g2 = jax.jit(jax.grad(loss(unfused), argnums=(0, 1, 2, 3, 4)))(*args)
        for a, bb_ in zip(g1, g2):
            a = np.asarray(a, np.float32)
            bb_ = np.asarray(bb_, np.float32)
            rel = np.abs(a - bb_).max() / (np.abs(bb_).max() + 1e-9)
            assert rel < 2e-2


@pytest.mark.parametrize("shape", [(4, 12, 197), (2, 25, 198)])
def test_packed_self_attention_matches_reference(shape):
    """flash_self_attention_packed (residual-lean qkv->bsd path) vs the jnp
    reference, forward and grad wrt the packed qkv projection output."""
    from arsvt_tpu.ops.attention import self_attention_from_qkv
    from arsvt_tpu.ops.pallas.flash_attention import (
        flash_self_attention_packed,
    )

    b, h, s = shape
    d = h * 64 if h == 12 else h * 16
    qkv = _rand(jax.random.PRNGKey(3), (b, s, 3 * d))
    with jax.default_device(jax.devices("tpu")[0]):
        out = jax.jit(
            lambda x: flash_self_attention_packed(x, h)
        )(qkv)
        ref = self_attention_from_qkv(qkv, h, force_reference=True)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
        assert err.max() < 2e-2

        g1 = jax.jit(jax.grad(lambda x: jnp.sum(
            flash_self_attention_packed(x, h).astype(jnp.float32) ** 2
        )))(qkv)
        g2 = jax.grad(lambda x: jnp.sum(
            self_attention_from_qkv(x, h, force_reference=True)
            .astype(jnp.float32) ** 2
        ))(qkv)
        a = np.asarray(g1, np.float32)
        bb = np.asarray(g2, np.float32)
        rel = np.abs(a - bb).max() / (np.abs(bb).max() + 1e-9)
        assert rel < 2e-2


# -------------------------------------------------- in-kernel attn dropout
#
# The dropout mask is value-independent (seeded only by grid indices), so
# the EXACT mask can be extracted with basis-vector probes on V; fwd and
# every grad are then checked against a jnp reference using that same mask.
# Reference semantics: dropout on softmax probabilities, train.py:545,1352.


def _extract_mask_legacy(q, k, seed, rate):
    from arsvt_tpu.ops.pallas.flash_attention import _fwd, _pick_block_b

    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    block_b = _pick_block_b(b, s, s)

    @jax.jit
    def probe(vv):
        out, _ = _fwd(q, k, vv, scale=scale, kv_len=s, block_b=block_b,
                      dropout_rate=rate, seed=seed)
        return out

    cols = []
    for k0 in range(s):
        vv = jnp.zeros((b, h, s, d), q.dtype).at[:, :, k0, :].set(1.0)
        cols.append(np.asarray(probe(vv))[..., 0])
    return np.stack(cols, axis=-1)  # (B,H,S,S) = M*P/keep


def test_flash_dropout_matches_masked_reference():
    from arsvt_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_self_attention_packed, seed_from_rng,
    )

    rate, keep = 0.3, 0.7
    b, h, s, d = 2, 2, 128, 64
    rng = jax.random.PRNGKey(42)
    seed = seed_from_rng(rng)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.float32)
    scale = 1.0 / (d ** 0.5)

    a_mat = _extract_mask_legacy(q, k, seed, rate)
    p_ref = np.asarray(jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale, axis=-1))
    mask = a_mat > 1e-12
    assert abs(mask.mean() - keep) < 0.02  # Bernoulli(keep) fraction
    rel = (np.abs(a_mat - mask * p_ref / keep) / (p_ref / keep + 1e-6)).max()
    assert rel < 2e-2  # in-kernel dots truncate fp32 at precision=DEFAULT

    mask_j = jnp.asarray(mask)

    def ref(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale, axis=-1)
        p = jnp.where(mask_j, p / keep, 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    g_c = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, d),
                            jnp.float32)
    out_k = jax.jit(lambda: flash_attention(
        q, k, v, dropout_rate=rate, dropout_rng=rng))()
    out_r = ref(q, k, v)
    e = np.abs(np.asarray(out_k) - np.asarray(out_r)).max()
    e /= np.abs(np.asarray(out_r)).max()
    assert e < 2e-2

    loss_k = lambda q, k, v: jnp.sum(flash_attention(  # noqa: E731
        q, k, v, dropout_rate=rate, dropout_rng=rng) * g_c)
    loss_r = lambda q, k, v: jnp.sum(ref(q, k, v) * g_c)  # noqa: E731
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, bb_ in zip(gk, gr):
        rel = np.abs(np.asarray(a) - np.asarray(bb_)).max()
        rel /= np.abs(np.asarray(bb_)).max() + 1e-9
        assert rel < 2e-2

    # determinism + seed sensitivity
    out_k2 = jax.jit(lambda: flash_attention(
        q, k, v, dropout_rate=rate, dropout_rng=rng))()
    assert np.array_equal(np.asarray(out_k), np.asarray(out_k2))
    out_k3 = flash_attention(q, k, v, dropout_rate=rate,
                             dropout_rng=jax.random.PRNGKey(7))
    assert not np.array_equal(np.asarray(out_k), np.asarray(out_k3))

    # packed layout shares the kernels + seeding -> identical output
    qkv_flat = jnp.stack([q, k, v]).transpose(1, 3, 0, 2, 4).reshape(
        b, s, 3 * h * d)
    out_p = jax.jit(lambda x: flash_self_attention_packed(
        x, h, dropout_rate=rate, dropout_rng=rng))(qkv_flat)
    out_p = np.asarray(out_p).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    assert np.abs(out_p - np.asarray(out_k)).max() < 1e-5


def test_fused_encoder_dropout_matches_masked_reference():
    from arsvt_tpu.ops.pallas.flash_attention import (
        _fwd_direct, fused_encoder_attention, seed_from_rng,
    )

    rate, keep = 0.3, 0.7
    b, h, s, hd = 2, 2, 128, 64
    d = h * hd
    scale = 1.0 / (hd ** 0.5)
    rng = jax.random.PRNGKey(42)
    seed = seed_from_rng(rng)
    key = jax.random.PRNGKey(1)
    y = jax.random.normal(key, (b, s, d), jnp.float32)
    wqkv = jax.random.normal(jax.random.fold_in(key, 5), (d, 3 * d),
                             jnp.float32) * 0.05
    bqkv = jax.random.normal(jax.random.fold_in(key, 6), (3 * d,),
                             jnp.float32) * 0.1
    wproj = jax.random.normal(jax.random.fold_in(key, 7), (d, d),
                              jnp.float32) * 0.05
    bproj = jax.random.normal(jax.random.fold_in(key, 8), (d,),
                              jnp.float32) * 0.1

    # extract the direct-kernel mask with V-basis probes
    @jax.jit
    def probe(qkv_probe):
        out, _ = _fwd_direct(qkv_probe, h, dropout_rate=rate, seed=seed)
        return out

    base = jnp.zeros((b, s, 3 * d), jnp.float32).at[:, :, : 2 * d].set(
        jax.random.normal(jax.random.fold_in(key, 9), (b, s, 2 * d),
                          jnp.float32))
    cols = []
    for k0 in range(s):
        o = np.asarray(probe(base.at[:, k0, 2 * d:].set(1.0)))
        cols.append(np.stack([o[:, :, t * hd] for t in range(h)], axis=1))
    a_mat = np.stack(cols, axis=-1)  # (B,H,S,S)
    qd = np.asarray(base[:, :, :d]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    kd = np.asarray(base[:, :, d:2 * d]).reshape(b, s, h, hd).transpose(
        0, 2, 1, 3)
    p_ref = np.asarray(jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qd, kd) * scale, axis=-1))
    mask = a_mat > 1e-12
    assert abs(mask.mean() - keep) < 0.02
    rel = (np.abs(a_mat - mask * p_ref / keep) / (p_ref / keep + 1e-6)).max()
    assert rel < 2e-2
    mask_j = jnp.asarray(mask)

    def enc_ref(y, wqkv, bqkv, wproj, bproj):
        qkv = jnp.dot(y, wqkv) + bqkv
        qq = qkv[:, :, :d].reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        kk = qkv[:, :, d:2 * d].reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        vv = qkv[:, :, 2 * d:].reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qq, kk) * scale, axis=-1)
        p = jnp.where(mask_j, p / keep, 0.0)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vv)
        return jnp.dot(o.transpose(0, 2, 1, 3).reshape(b, s, d),
                       wproj) + bproj

    args = (y, wqkv, bqkv, wproj, bproj)
    out_f = jax.jit(lambda *a: fused_encoder_attention(
        *a, h, dropout_rate=rate, dropout_rng=rng))(*args)
    out_r = enc_ref(*args)
    e = np.abs(np.asarray(out_f) - np.asarray(out_r)).max()
    e /= np.abs(np.asarray(out_r)).max()
    assert e < 2e-2

    g_c = jax.random.normal(jax.random.fold_in(key, 10), (b, s, d),
                            jnp.float32)
    loss_f = lambda *a: jnp.sum(fused_encoder_attention(  # noqa: E731
        *a, h, dropout_rate=rate, dropout_rng=rng) * g_c)
    loss_r = lambda *a: jnp.sum(enc_ref(*a) * g_c)  # noqa: E731
    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3, 4)))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(*args)
    for a, bb_ in zip(gf, gr):
        rel = np.abs(np.asarray(a) - np.asarray(bb_)).max()
        rel /= np.abs(np.asarray(bb_)).max() + 1e-9
        assert rel < 2e-2


def test_fused_encoder_savep_matches_standard():
    """Save-probs fused encoder attention (backward reads the saved bf16 P
    instead of recomputing QKᵀ/exp) vs the standard fused path: identical
    forward, grads within bf16-P tolerance. Also with dropout at a fixed
    seed — both variants must sample the SAME in-kernel mask."""
    from arsvt_tpu.ops.pallas.flash_attention import (
        fused_encoder_attention,
        fused_encoder_attention_savep,
    )

    b, s, d, h = 4, 197, 768, 12
    key = jax.random.PRNGKey(11)
    y = _rand(key, (b, s, d))
    wqkv = (_rand(jax.random.fold_in(key, 1), (d, 3 * d), jnp.float32)
            * 0.05).astype(jnp.bfloat16)
    bqkv = _rand(jax.random.fold_in(key, 2), (3 * d,)) * 0.1
    wproj = (_rand(jax.random.fold_in(key, 3), (d, d), jnp.float32)
             * 0.05).astype(jnp.bfloat16)
    bproj = _rand(jax.random.fold_in(key, 4), (d,)) * 0.1
    args = (y, wqkv, bqkv, wproj, bproj)

    for rate, rng in ((0.0, None), (0.2, jax.random.PRNGKey(5))):
        f_std = lambda *a: fused_encoder_attention(  # noqa: E731
            *a, h, dropout_rate=rate, dropout_rng=rng)
        f_sp = lambda *a: fused_encoder_attention_savep(  # noqa: E731
            *a, h, dropout_rate=rate, dropout_rng=rng)
        out_std = jax.jit(f_std)(*args)
        out_sp = jax.jit(f_sp)(*args)
        err = np.abs(np.asarray(out_std, np.float32)
                     - np.asarray(out_sp, np.float32))
        # fwd math is identical up to the (p/l) association order
        assert err.max() < 2e-2, (rate, err.max())

        loss = lambda f: lambda *a: jnp.sum(  # noqa: E731
            f(*a).astype(jnp.float32) ** 2)
        g1 = jax.jit(jax.grad(loss(f_sp), argnums=(0, 1, 2, 3, 4)))(*args)
        g2 = jax.jit(jax.grad(loss(f_std), argnums=(0, 1, 2, 3, 4)))(*args)
        for a, bb_ in zip(g1, g2):
            a = np.asarray(a, np.float32)
            bb_ = np.asarray(bb_, np.float32)
            rel = np.abs(a - bb_).max() / (np.abs(bb_).max() + 1e-9)
            assert rel < 2e-2, rate


def test_fused_adamw_kernel_matches_jnp():
    """Fused AdamW Pallas kernel (ops/pallas/fused_adamw.py) vs the
    identical-math jnp path on the real chip, both weight-decay variants,
    including the input/output aliasing (in-place p/m/v update)."""
    from arsvt_tpu.ops.pallas.fused_adamw import (
        _adamw_leaf_jnp,
        _adamw_leaf_pallas,
    )

    rng = np.random.default_rng(7)
    shape = (12, 768, 384)
    mk = lambda: jnp.asarray(rng.normal(size=shape), jnp.float32)  # noqa
    g, m, v, p = mk(), jnp.abs(mk()) * 1e-2, jnp.abs(mk()) * 1e-4, mk()
    scalars = jnp.asarray([0.5, 0.1, 0.001, 3e-4], jnp.float32)
    for wd in (0.0, 0.05):
        out_k = _adamw_leaf_pallas(scalars, g, m, v, p, b1=0.9, b2=0.999,
                                   eps=1e-8, wd=wd)
        out_j = _adamw_leaf_jnp(scalars, g, m, v, p, b1=0.9, b2=0.999,
                                eps=1e-8, wd=wd)
        for a, b in zip(out_k, out_j):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
