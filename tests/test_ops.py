"""Unit tests for the ops layer (jnp reference implementations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.ops import (
    extract_patches,
    gelu_mlp,
    layer_norm,
    patch_embed,
    sdpa_reference,
)


def test_sdpa_matches_naive():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, 7, 16))
    k = jax.random.normal(kk, (2, 3, 9, 16))
    v = jax.random.normal(kv, (2, 3, 9, 16))
    out = sdpa_reference(q, k, v)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(16)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    expected = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_sdpa_mask():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 1, 4, 8))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 6, 8))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 6, 8))
    mask = jnp.ones((1, 1, 4, 6), bool).at[..., 3:].set(False)
    out_masked = sdpa_reference(q, k, v, mask=mask)
    out_trunc = sdpa_reference(q, k[:, :, :3], v[:, :, :3])
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_trunc), atol=1e-5
    )


def test_layer_norm_stats():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 10, 32))
    y = layer_norm(x, jnp.ones((32,)), jnp.zeros((32,)))
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_layer_norm_bf16_uses_fp32_stats():
    x = (1000.0 + jax.random.normal(jax.random.PRNGKey(3), (2, 8, 128))).astype(
        jnp.bfloat16
    )
    y = layer_norm(x, jnp.ones((128,)), jnp.zeros((128,)))
    assert y.dtype == jnp.bfloat16
    assert np.abs(np.asarray(y.astype(jnp.float32).mean(-1))).max() < 0.1


def test_gelu_mlp_shapes_and_values():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 5, 8))
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (8, 16)) * 0.1
    b1 = jnp.zeros((16,))
    w2 = jax.random.normal(jax.random.fold_in(key, 2), (16, 8)) * 0.1
    b2 = jnp.zeros((8,))
    out = gelu_mlp(x, w1, b1, w2, b2, force_reference=True)
    expected = jax.nn.gelu(x @ w1, approximate=True) @ w2
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_extract_patches_roundtrip():
    imgs = jnp.arange(1 * 8 * 8 * 3, dtype=jnp.float32).reshape(1, 8, 8, 3)
    patches = extract_patches(imgs, 4)
    assert patches.shape == (1, 4, 48)
    # first patch == top-left 4x4 block
    np.testing.assert_array_equal(
        np.asarray(patches[0, 0].reshape(4, 4, 3)), np.asarray(imgs[0, :4, :4])
    )


def test_patch_embed_equals_conv():
    key = jax.random.PRNGKey(5)
    imgs = jax.random.normal(key, (2, 16, 16, 3))
    p = 8
    kernel = jax.random.normal(jax.random.fold_in(key, 1), (p * p * 3, 10)) * 0.1
    bias = jax.random.normal(jax.random.fold_in(key, 2), (10,))
    out = patch_embed(imgs, kernel, bias, patch_size=p)
    # oracle: strided conv via lax
    conv_kernel = kernel.reshape(p, p, 3, 10)
    conv = jax.lax.conv_general_dilated(
        imgs, conv_kernel, (p, p), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(conv.reshape(2, 4, 10)), atol=1e-4
    )


def test_fused_encoder_attention_rejects_unsupported_geometry():
    """The 128-lane column-block kernel cannot cover e.g. DeiT-400d's
    H=8/d=50 — the public entry must error, not compute garbage (dispatch
    routes such geometries to the qkv/flash path)."""
    import pytest as _pytest

    from arsvt_tpu.ops.pallas.flash_attention import fused_encoder_attention

    d, h = 400, 8
    y = jnp.zeros((2, 8, d), jnp.bfloat16)
    with _pytest.raises(ValueError, match="unsupported geometry"):
        fused_encoder_attention(
            y, jnp.zeros((d, 3 * d), jnp.bfloat16),
            jnp.zeros((3 * d,), jnp.bfloat16),
            jnp.zeros((d, d), jnp.bfloat16),
            jnp.zeros((d,), jnp.bfloat16), h,
        )
