"""Patch embedding as a single MXU matmul.

The reference uses Conv2d(kernel=stride=16) then flatten/transpose
(/root/reference/train.py:498-515). On TPU a stride=kernel conv is exactly a
reshape + one (B·N, p²·C) × (p²·C, D) matmul, which maps straight onto the
MXU with no im2col overhead — so that is the implementation, not
`lax.conv`. Images are NHWC (TPU-native layout; the reference's NCHW +
channels_last juggling at train.py:1570 disappears).
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(images, patch_size: int):
    """(B, H, W, C) -> (B, N, p*p*C) non-overlapping patches, row-major."""
    b, h, w, c = images.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"image {h}x{w} not divisible by patch {p}")
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, Hp, Wp, p, p, C)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def patch_embed(images, kernel, bias, *, patch_size: int):
    """images: (B, H, W, C); kernel: (p*p*C, D); bias: (D,). -> (B, N, D)."""
    patches = extract_patches(images, patch_size)
    out = (
        jnp.dot(patches, kernel.astype(patches.dtype),
                preferred_element_type=jnp.float32)
        + bias.astype(jnp.float32)
    )
    return out.astype(images.dtype)
