"""On-device image augmentation — jitted, PRNG-keyed, bbox-tracking.

TPU-native replacement for the reference's albumentations pipelines
(/root/reference/train.py:387-489, evaluation.py:360-366), which ran OpenCV
C++ on 16 fork'd CPU workers. Here every op is pure jnp on fp32 [0,1] HWC
images with static shapes, vmapped over the batch and fused by XLA into the
preprocessing stage that feeds HBM-resident batches (BASELINE.json
north-star). Boxes are normalized x1y1x2y2 + validity masks; geometric ops
update both, replacing albumentations' BboxParams(min_area=1.0,
min_visibility=0.1) refiltering (train.py:444-446,166-195) with mask updates.

Train-pipeline parity (train.py:387-443):
  LongestMaxSize+PadIfNeeded (host, see pipeline.py) → RandomShadow →
  HorizontalFlip(.5) → Affine(scale .95-1.05, translate ±5%, rotate ±45°,
  shear ±15°) → ColorJitter(p=.6) → CoarseDropout(p=.25) → Normalize →
  (tensor layout is already NHWC).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def augment_input_cast(images):
    """Opt-in (ARSVT_AUGMENT_BF16=1): run the on-device augmentation in
    bf16 instead of fp32 — halves the warp-gather and elementwise HBM
    traffic of the fused augmentation stage. Pixel precision near 1.0 is
    2^-8 in bf16, the same granularity as the uint8 source pixels, and
    the model consumes bf16 (compute dtype) right after augmentation
    anyway; default stays fp32 so augmented pixels match the fp32
    oracles bit-for-bit. Measured per-variant in
    benchmarks/warp_bench.py's bf16 rows."""
    if os.environ.get("ARSVT_AUGMENT_BF16"):
        return images.astype(jnp.bfloat16)
    return images


# ------------------------------------------------------------ photometric


def normalize(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    mean = jnp.asarray(mean, image.dtype)
    std = jnp.asarray(std, image.dtype)
    return (image - mean) / std


def denormalize(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    mean = jnp.asarray(mean, image.dtype)
    std = jnp.asarray(std, image.dtype)
    return image * std + mean


def adjust_brightness(image, factor):
    # factors cast to image dtype: keeps the op dtype-stable so the
    # ARSVT_AUGMENT_BF16 path's lax.switch branches agree (f32 default
    # unchanged — the cast is a no-op there)
    return image * jnp.asarray(factor, image.dtype)


def adjust_contrast(image, factor):
    mean = jnp.mean(image, axis=(-3, -2, -1), keepdims=True)
    return (image - mean) * jnp.asarray(factor, image.dtype) + mean


def adjust_saturation(image, factor):
    gray = jnp.mean(image, axis=-1, keepdims=True)
    return gray + (image - gray) * jnp.asarray(factor, image.dtype)


def adjust_hue(image, radians):
    """Hue rotation via the classic RGB rotation matrix (gray-axis rotation)."""
    c, s = jnp.cos(radians), jnp.sin(radians)
    m = jnp.stack(
        [
            jnp.stack([0.299 + 0.701 * c + 0.168 * s,
                       0.587 - 0.587 * c + 0.330 * s,
                       0.114 - 0.114 * c - 0.497 * s]),
            jnp.stack([0.299 - 0.299 * c - 0.328 * s,
                       0.587 + 0.413 * c + 0.035 * s,
                       0.114 - 0.114 * c + 0.292 * s]),
            jnp.stack([0.299 - 0.300 * c + 1.250 * s,
                       0.587 - 0.588 * c - 1.050 * s,
                       0.114 + 0.886 * c - 0.203 * s]),
        ]
    ).astype(image.dtype)
    return jnp.einsum("...c,kc->...k", image, m)


def color_jitter(key, image, *, brightness=0.2, contrast=0.2, saturation=0.2,
                 hue=0.2, p=1.0):
    """albumentations-style ColorJitter.

    `hue` follows the torchvision/albumentations convention: a shift of the
    hue wheel in turns (0.5 = 180°), so the rotation is hue * 2π radians.

    The four adjustments are applied in a RANDOM ORDER per call, matching
    torchvision/albumentations ColorJitter (train.py:427-433) — the ops do
    not commute, so a fixed order would produce a (slightly) different
    augmentation distribution. Implemented as a static 4-slot loop with a
    switch over the op index per slot; under vmap every branch is computed
    and selected (4x the elementwise passes), still negligible next to the
    affine warp.
    """
    kp, ko, kb, kc, ks, kh = jax.random.split(key, 6)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue) * 2.0 * jnp.pi
    ops = (
        lambda im: adjust_brightness(im, b),
        lambda im: adjust_contrast(im, c),
        lambda im: adjust_saturation(im, s),
        lambda im: adjust_hue(im, h),
    )
    perm = jax.random.permutation(ko, 4)
    out = image
    for slot in range(4):
        out = jax.lax.switch(perm[slot], ops, out)
    out = jnp.clip(out, 0.0, 1.0)
    apply = jax.random.bernoulli(kp, p)
    return jnp.where(apply, out, image)


def random_shadow(key, image, *, p=0.5, num_shadows=(1, 3),
                  intensity=(0.2, 0.7), roi=(0.0, 0.7, 1.0, 1.0)):
    """1-3 darkened half-plane regions constrained to `roi`.

    Parity with A.RandomShadow(shadow_roi=[0, 0.7, 1, 1],
    num_shadows_limit=[1, 3], shadow_intensity_range=[0.2, 0.7])
    (train.py:396-401): shadows live in the bottom 30% of the image, each
    darkens its region by (1 - intensity), overlaps compound. The
    reference's 5-vertex polygons become half-planes ∩ ROI here — same
    statistics (random orientation/position/area inside the ROI), static
    shapes for jit.
    """
    h, w, _ = image.shape
    kp, kn, krest = jax.random.split(key, 3)
    lo, hi = num_shadows
    n = jax.random.randint(kn, (), lo, hi + 1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / h
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / w
    rx1, ry1, rx2, ry2 = roi
    roi_mask = (xx >= rx1) & (xx < rx2) & (yy >= ry1) & (yy < ry2)
    factor = jnp.ones((h, w), jnp.float32)
    keys = jax.random.split(krest, hi)
    for i in range(hi):
        ka, kox, koy, ki = jax.random.split(keys[i], 4)
        angle = jax.random.uniform(ka, (), minval=0.0, maxval=jnp.pi)
        ox = jax.random.uniform(kox, (), minval=rx1, maxval=rx2)
        oy = jax.random.uniform(koy, (), minval=ry1, maxval=ry2)
        side = (
            (xx - ox) * jnp.cos(angle) + (yy - oy) * jnp.sin(angle)
        ) > 0.0
        inten = jax.random.uniform(
            ki, (), minval=intensity[0], maxval=intensity[1]
        )
        factor = factor * jnp.where(
            side & roi_mask & (i < n), 1.0 - inten, 1.0
        )
    shade = image * factor[..., None]
    apply = jax.random.bernoulli(kp, p)
    return jnp.where(apply, shade, image)


def coarse_dropout(key, image, *, p=0.25, num_holes=(1, 3),
                   hole_height=(0.05, 0.12), hole_width=(0.05, 0.12),
                   fill=1.0):
    """Fill 1-3 rectangles sized 5-12% of each image side with `fill`.

    Parity with A.CoarseDropout(num_holes_range=(1, 3),
    hole_height_range=(0.05, 0.12), hole_width_range=(0.05, 0.12),
    fill=255) (train.py:434-441) — fill 255 is white = 1.0 in [0,1] space.
    """
    h, w, _ = image.shape
    kp, kn, ky, kx, kh_, kw_ = jax.random.split(key, 6)
    lo, hi = num_holes
    n = jax.random.randint(kn, (), lo, hi + 1)
    hh = jax.random.uniform(
        kh_, (hi,), minval=hole_height[0], maxval=hole_height[1]
    ) * h
    ww = jax.random.uniform(
        kw_, (hi,), minval=hole_width[0], maxval=hole_width[1]
    ) * w
    ys = jax.random.uniform(ky, (hi,)) * (h - hh)
    xs = jax.random.uniform(kx, (hi,)) * (w - ww)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    drop = jnp.zeros((h, w), bool)
    for i in range(hi):
        inside = (
            (yy >= ys[i]) & (yy < ys[i] + hh[i])
            & (xx >= xs[i]) & (xx < xs[i] + ww[i])
            & (i < n)
        )
        drop = drop | inside
    out = jnp.where(drop[..., None], jnp.asarray(fill, image.dtype), image)
    apply = jax.random.bernoulli(kp, p)
    return jnp.where(apply, out, image)


# -------------------------------------------------------------- geometric


def random_horizontal_flip(key, image, boxes=None, *, p=0.5):
    flip = jax.random.bernoulli(key, p)
    out = jnp.where(flip, image[:, ::-1], image)
    if boxes is None:
        return out
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    flipped = jnp.concatenate([1.0 - x2, y1, 1.0 - x1, y2], axis=-1)
    return out, jnp.where(flip, flipped, boxes)


def _affine_matrix(key, h, w, *, degrees, scale, translate, shear):
    """Forward pixel-space transform (input px -> output px), center-origin."""
    ka, ks, kt, ksh = jax.random.split(key, 4)
    theta = jnp.deg2rad(
        jax.random.uniform(ka, (), minval=-degrees, maxval=degrees)
    )
    s = jax.random.uniform(ks, (), minval=scale[0], maxval=scale[1])
    t = jax.random.uniform(kt, (2,), minval=-translate, maxval=translate)
    sh = jnp.deg2rad(
        jax.random.uniform(ksh, (2,), minval=-shear, maxval=shear)
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    rot = rot.at[0, 0].set(cos).at[0, 1].set(-sin)
    rot = rot.at[1, 0].set(sin).at[1, 1].set(cos)
    shear_m = jnp.eye(3)
    shear_m = shear_m.at[0, 1].set(jnp.tan(sh[0]))
    shear_m = shear_m.at[1, 0].set(jnp.tan(sh[1]))
    scale_m = jnp.eye(3) * jnp.array([s, s, 1.0])
    trans = jnp.eye(3).at[0, 2].set(t[0] * w).at[1, 2].set(t[1] * h)
    center = jnp.eye(3).at[0, 2].set(w / 2.0).at[1, 2].set(h / 2.0)
    uncenter = jnp.eye(3).at[0, 2].set(-w / 2.0).at[1, 2].set(-h / 2.0)
    return center @ trans @ rot @ shear_m @ scale_m @ uncenter


def _src_coords(image, inv_matrix):
    h, w, _ = image.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ones = jnp.ones_like(xx)
    coords = jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)
    src = inv_matrix @ coords
    return src[0], src[1]


def _gather_px(image, yi, xi):
    h, w, _ = image.shape
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    vals = image[yi_c, xi_c]  # (HW, C)
    return jnp.where(valid[:, None], vals, 0.0)


def _bilinear_warp_taps(image, inv_matrix):
    """Four independent 2-D gathers, one per bilinear tap."""
    h, w, c = image.shape
    sx, sy = _src_coords(image, inv_matrix)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    # weights in image dtype: under ARSVT_AUGMENT_BF16 the whole blend
    # stays bf16 (weight granularity 2^-8 of a pixel step, immaterial
    # for augmentation); fp32 images are untouched
    wx = (sx - x0).astype(image.dtype)[:, None]
    wy = (sy - y0).astype(image.dtype)[:, None]
    out = (
        _gather_px(image, y0, x0) * (1 - wy) * (1 - wx)
        + _gather_px(image, y0, x0 + 1) * (1 - wy) * wx
        + _gather_px(image, y0 + 1, x0) * wy * (1 - wx)
        + _gather_px(image, y0 + 1, x0 + 1) * wy * wx
    )
    return out.reshape(h, w, c)


def _gather_px_flat(image, yi, xi):
    """Same contract as _gather_px via ONE collapsed linear index into the
    (H*W, C) flattened image — a 1-D gather instead of a 2-D one."""
    h, w, _ = image.shape
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    vals = jnp.take(image.reshape(h * w, -1), yi_c * w + xi_c, axis=0)
    return jnp.where(valid[:, None], vals, 0.0)


def _bilinear_warp_flat(image, inv_matrix):
    """Bilinear warp with linear-index 1-D gathers (same math as taps)."""
    h, w, c = image.shape
    sx, sy = _src_coords(image, inv_matrix)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    # weights in image dtype: under ARSVT_AUGMENT_BF16 the whole blend
    # stays bf16 (weight granularity 2^-8 of a pixel step, immaterial
    # for augmentation); fp32 images are untouched
    wx = (sx - x0).astype(image.dtype)[:, None]
    wy = (sy - y0).astype(image.dtype)[:, None]
    out = (
        _gather_px_flat(image, y0, x0) * (1 - wy) * (1 - wx)
        + _gather_px_flat(image, y0, x0 + 1) * (1 - wy) * wx
        + _gather_px_flat(image, y0 + 1, x0) * wy * (1 - wx)
        + _gather_px_flat(image, y0 + 1, x0 + 1) * wy * wx
    )
    return out.reshape(h, w, c)


def _bilinear_warp_patch(image, inv_matrix):
    """Bilinear warp with ONE lax.gather of (2,2,C) patches.

    The four taps of a pixel live in one 2x2 neighborhood; gathering the
    patch once and selecting corners with elementwise `where`s trades 4
    gathers for 1 gather + cheap VPU selects. Clipped patch origins keep
    edge reads in bounds; each tap's true offset inside the clipped patch
    is recomputed (0 or 1) and out-of-image taps are masked to zero, so
    the result is tap-for-tap identical to the other variants."""
    h, w, c = image.shape
    sx, sy = _src_coords(image, inv_matrix)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    # weights in image dtype: under ARSVT_AUGMENT_BF16 the whole blend
    # stays bf16 (weight granularity 2^-8 of a pixel step, immaterial
    # for augmentation); fp32 images are untouched
    wx = (sx - x0).astype(image.dtype)[:, None]
    wy = (sy - y0).astype(image.dtype)[:, None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    oy = jnp.clip(y0i, 0, h - 2)
    ox = jnp.clip(x0i, 0, w - 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patch = jax.lax.gather(
        image, jnp.stack([oy, ox], axis=1), dn, slice_sizes=(2, 2, c),
        mode="clip",
    )  # (HW, 2, 2, C)

    def tap(ty, tx):
        valid = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        ry = jnp.clip(ty - oy, 0, 1)[:, None, None]
        rx = jnp.clip(tx - ox, 0, 1)
        row = jnp.where(ry == 0, patch[:, 0], patch[:, 1])  # (HW, 2, C)
        val = jnp.where((rx == 0)[:, None], row[:, 0], row[:, 1])
        return jnp.where(valid[:, None], val, 0.0)

    out = (
        tap(y0i, x0i) * (1 - wy) * (1 - wx)
        + tap(y0i, x0i + 1) * (1 - wy) * wx
        + tap(y0i + 1, x0i) * wy * (1 - wx)
        + tap(y0i + 1, x0i + 1) * wy * wx
    )
    return out.reshape(h, w, c)


# ------------------------------------------- gather-free matmul warp
#
# TPU gathers fetch 3-element pixel slices through a 128-lane memory
# system — the 4-tap warp above measured ~89 ms per bs32x256² batch on
# the chip, most of the reference-config detector step, and every
# gather formulation shares the scalar-access pathology. This variant
# removes gathers entirely: the affine is decomposed into THREE 1-D
# linear-resample passes (x scale+translate → y scale+shear → x shear),
# and each 1-D pass is a banded-weight MATMUL (weights built from iota
# arithmetic, band position = the pass's linear coordinate map) that
# runs on the MXU. ~2 GFLOP + ~200 MB of weight traffic per bs32 batch
# instead of 6.4 M scattered reads.
#
# APPROXIMATE: three sequential 1-D lerps are not the single 2-D
# bilinear lerp (slightly more smoothing along diagonals) — same class
# of documented resampler deviation as bilinear-vs-LANCZOS4
# (random_affine docstring). Box geometry is EXACT: boxes transform
# through the matrix itself (_transform_boxes), never the resampler.
#
# Decomposition (out→src map M = inv_matrix, b1=0 branch):
#   pass1: x' = M00·x + M02                 (uniform x scale+translate)
#   pass2: y' = (M11 − M10·M01/M00)·y + M10·x + M12   (y scale + shear)
#   pass3: x  = x + (M01/M00)·y             (x shear)
# Valid while |M00| is not tiny — the augmentation magnitude bounds
# (|rot| ≤ 45°, |shear| ≤ 15°, scale ≈ 1) keep M00 ≥ ~0.3 and
# |M01/M00| ≤ tan(60°) ≈ 1.73; the static intermediate-canvas pad
# covers |b3| ≤ _SHEAR_MAX_SKEW (env ARSVT_SHEAR_MAXSKEW for wilder
# matrices; band weights just clamp to zero beyond it).


_SHEAR_MAX_SKEW = float(os.environ.get("ARSVT_SHEAR_MAXSKEW", "1.75"))


def _band_weights(pos, n):
    """(J,) fractional source positions -> (J, n) two-tap linear-interp
    band matrix: W[j, i] = max(0, 1 - |pos[j] - i|). Out-of-range
    positions get all-zero rows = the warp's zeros-outside contract."""
    i = jax.lax.broadcasted_iota(jnp.float32, (pos.shape[0], n), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - i))


def _shear_matmul_warp(image, inv_matrix):
    h, w, c = image.shape
    dt = image.dtype
    m = inv_matrix.astype(jnp.float32)
    m00, m01, m02 = m[0, 0], m[0, 1], m[0, 2]
    m10, m11, m12 = m[1, 0], m[1, 1], m[1, 2]
    b3 = m01 / m00
    a2 = m11 - m10 * b3
    pad = int(np.ceil(_SHEAR_MAX_SKEW * max(h, w)))
    wp = w + 2 * pad

    # pass 1 — x' = m00·(j − pad) + m02 over the padded x axis: one
    # (wp, w) matmul shared by every row
    pos1 = m00 * (jnp.arange(wp, dtype=jnp.float32) - pad) + m02
    c1m = _band_weights(pos1, w).astype(dt)
    t1 = jnp.einsum("ji,hic->hjc", c1m, image,
                    preferred_element_type=jnp.float32).astype(dt)

    # pass 2 — y' = a2·y + m10·(j − pad) + m12: per-column band matrices,
    # chunked over column blocks to bound the (cols, h, h) weight tensor
    blk = 128
    nb = -(-wp // blk)
    t1p = jnp.pad(t1, ((0, 0), (0, nb * blk - wp), (0, 0)))
    t1b = t1p.reshape(h, nb, blk, c).transpose(1, 2, 0, 3)  # (nb,blk,h,c)

    yy = jnp.arange(h, dtype=jnp.float32)

    def pass2_block(b, tb):
        # tb: (blk, h, c); columns j = b*blk + k − pad
        j = b * blk + jnp.arange(blk, dtype=jnp.float32) - pad
        posv = a2 * yy[None, :] + (m10 * j + m12)[:, None]  # (blk, h)
        cm = _band_weights(posv.reshape(-1), h).reshape(blk, h, h)
        return jnp.einsum("kyu,kuc->kyc", cm.astype(dt), tb,
                          preferred_element_type=jnp.float32).astype(dt)

    t2b = jax.lax.map(
        lambda args: pass2_block(*args),
        (jnp.arange(nb, dtype=jnp.float32), t1b),
    )  # (nb, blk, h, c)
    t2 = t2b.transpose(2, 0, 1, 3).reshape(h, nb * blk, c)[:, :wp]

    # pass 3 — x = (j − pad) sampled at x_out + b3·y + pad: per-row band
    # matrices over the padded axis, chunked over row blocks
    rblk = 32
    nrb = -(-h // rblk)
    t2p = jnp.pad(t2, ((0, nrb * rblk - h), (0, 0), (0, 0)))
    t2r = t2p.reshape(nrb, rblk, wp, c)

    xx = jnp.arange(w, dtype=jnp.float32)

    def pass3_block(r, tr):
        # tr: (rblk, wp, c); rows y = r*rblk + s
        y = r * rblk + jnp.arange(rblk, dtype=jnp.float32)
        pos3 = xx[None, :] + b3 * y[:, None] + pad  # (rblk, w)
        cm = _band_weights(pos3.reshape(-1), wp).reshape(rblk, w, wp)
        return jnp.einsum("sxj,sjc->sxc", cm.astype(dt), tr,
                          preferred_element_type=jnp.float32).astype(dt)

    outr = jax.lax.map(
        lambda args: pass3_block(*args),
        (jnp.arange(nrb, dtype=jnp.float32), t2r),
    )
    return outr.reshape(nrb * rblk, w, c)[:h]


_BILINEAR_VARIANTS = {
    "taps": _bilinear_warp_taps,
    "flat": _bilinear_warp_flat,
    "patch": _bilinear_warp_patch,
    "shear_matmul": _shear_matmul_warp,
}

# "shear_matmul" (gather-free three-pass MXU warp) is the default: the
# round-5 detection convergence A/B passed its mAP-parity gate
# (detection_generalization_{taps,shear}.json — val mAP 0.587 vs 0.572,
# AP50 0.947 vs 0.942 at 6k steps, within short-run noise) and it cuts
# the warp stage 58.4 -> 9.2 ms and the full detection augment
# 60.7 -> 39.4 ms per bs32x224 batch on chip (warpbench_r5). Set
# ARSVT_WARP_VARIANT=taps (or warp_variant="taps" in the pipeline
# config) to get the exact OpenCV-parity gather resampler back.
_WARP_DEFAULT = "shear_matmul"


def _bilinear_warp(image, inv_matrix, variant: str | None = None):
    """Sample image at inv_matrix @ output coords; zeros outside.

    Gathers are the TPU weak spot and this op is the augmentation
    pipeline's dominant cost (~89 ms per bs32x256² batch with the "taps"
    variant — most of the reference-config detector step). The gather
    variants (taps/flat/patch) compute tap-for-tap identical results
    (parity-pinned in tests/test_data.py); "shear_matmul" is the
    gather-FREE three-pass MXU formulation (approximate resampler, see
    its section comment; mAP-parity-gated in recipe/convergence A/B).
    `variant` selects one explicitly — pipeline configs carry it so it
    is part of the jit trace key (an env var read inside an inner jit
    is invisible to its cache, the round-4 warpbench artifact's bug);
    None falls back to ARSVT_WARP_VARIANT."""
    name = variant or os.environ.get("ARSVT_WARP_VARIANT", _WARP_DEFAULT)
    # anchor the opt-in bf16 policy HERE: upstream photometric stages can
    # re-promote to f32 (f32 random factors), and the warp's gathers are
    # the traffic that halving actually pays for
    return _BILINEAR_VARIANTS[name](augment_input_cast(image), inv_matrix)


def _lanczos4_weights(frac):
    """8 Lanczos-4 tap weights at offsets -3..4 from floor(src), normalized
    to sum 1 (matching OpenCV's interpolation tables). frac: (N,) in [0,1)."""
    ws = []
    for i in range(8):
        t = jnp.abs(frac - (i - 3.0))
        pt = jnp.pi * jnp.maximum(t, 1e-8)
        val = 4.0 * jnp.sin(pt) * jnp.sin(pt / 4.0) / (pt * pt)
        ws.append(jnp.where(t < 1e-6, 1.0, jnp.where(t < 4.0, val, 0.0)))
    total = sum(ws)
    return [wi / total for wi in ws]


def _lanczos4_warp(image, inv_matrix):
    """8×8-tap Lanczos-4 resample at inv_matrix @ output coords — the
    reference's Affine interpolation (cv2.INTER_LANCZOS4,
    /root/reference/train.py:417). Out-of-bounds taps read the constant
    border 0 (cv2.BORDER_CONSTANT) and weights are NOT renormalized at the
    border, matching OpenCV. Separable accumulation: 8 row passes × 8
    column taps = 64 gathers per image."""
    h, w, c = image.shape
    sx, sy = _src_coords(image, inv_matrix)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wxs = _lanczos4_weights(sx - x0)
    wys = _lanczos4_weights(sy - y0)
    out = jnp.zeros((h * w, c), jnp.float32)
    for j in range(8):
        row = jnp.zeros((h * w, c), jnp.float32)
        for i in range(8):
            row += _gather_px(image, y0 + (j - 3), x0 + (i - 3)) * wxs[i][:, None]
        out += row * wys[j][:, None]
    # Lanczos overshoots at sharp edges; clamp like uint8 saturation does
    return jnp.clip(out, 0.0, 1.0).reshape(h, w, c)


_WARPS = {"bilinear": _bilinear_warp, "lanczos4": _lanczos4_warp}


def _transform_boxes(boxes, mask, fwd, h, w, *, min_visibility, min_area_px,
                     method: str = "largest_box"):
    """Forward-transform normalized boxes; AABB, clip, update validity.

    method "largest_box": AABB of the 4 transformed corners.
    method "ellipse" (the reference's rotate_method, train.py:422): AABB
    of the transformed INSCRIBED ellipse — for a linear map A the
    transformed ellipse's half-extents are hx = √((A00·a)² + (A01·b)²),
    hy = √((A10·a)² + (A11·b)²) (the analytic limit of albumentations'
    360-point boundary sampling); tighter than the corner AABB under
    rotation."""
    px = boxes * jnp.array([w, h, w, h], boxes.dtype)
    x1, y1, x2, y2 = px[:, 0], px[:, 1], px[:, 2], px[:, 3]
    if method == "ellipse":
        a = (x2 - x1) / 2.0
        b = (y2 - y1) / 2.0
        cx = (x1 + x2) / 2.0
        cy = (y1 + y2) / 2.0
        ncx = fwd[0, 0] * cx + fwd[0, 1] * cy + fwd[0, 2]
        ncy = fwd[1, 0] * cx + fwd[1, 1] * cy + fwd[1, 2]
        hx = jnp.sqrt((fwd[0, 0] * a) ** 2 + (fwd[0, 1] * b) ** 2)
        hy = jnp.sqrt((fwd[1, 0] * a) ** 2 + (fwd[1, 1] * b) ** 2)
        nx1, nx2 = ncx - hx, ncx + hx
        ny1, ny2 = ncy - hy, ncy + hy
    elif method == "largest_box":
        corners = jnp.stack(
            [
                jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
                jnp.stack([x1, y2], -1), jnp.stack([x2, y2], -1),
            ],
            axis=1,
        )  # (M, 4, 2)
        ones = jnp.ones(corners.shape[:2] + (1,), corners.dtype)
        hom = jnp.concatenate([corners, ones], axis=-1)  # (M,4,3)
        new = jnp.einsum("ij,mkj->mki", fwd, hom)[..., :2]
        nx1 = jnp.min(new[..., 0], axis=1)
        ny1 = jnp.min(new[..., 1], axis=1)
        nx2 = jnp.max(new[..., 0], axis=1)
        ny2 = jnp.max(new[..., 1], axis=1)
    else:
        raise ValueError(f"unknown box method {method!r}")
    full_area = jnp.maximum(nx2 - nx1, 0) * jnp.maximum(ny2 - ny1, 0)
    cx1, cy1 = jnp.clip(nx1, 0, w), jnp.clip(ny1, 0, h)
    cx2, cy2 = jnp.clip(nx2, 0, w), jnp.clip(ny2, 0, h)
    clip_area = jnp.maximum(cx2 - cx1, 0) * jnp.maximum(cy2 - cy1, 0)
    visibility = clip_area / jnp.maximum(full_area, 1e-6)
    new_mask = (
        mask
        & (clip_area >= min_area_px)
        & (visibility >= min_visibility)
    )
    out = jnp.stack([cx1 / w, cy1 / h, cx2 / w, cy2 / h], axis=-1)
    return out.astype(boxes.dtype), new_mask


def random_affine(key, image, boxes=None, mask=None, *, degrees=45.0,
                  scale=(0.95, 1.05), translate=0.05, shear=15.0,
                  min_visibility=0.1, min_area_px=1.0,
                  interpolation: str = "bilinear", p: float = 1.0,
                  box_method: str = "largest_box",
                  warp_variant: str | None = None):
    """Affine with bbox tracking (train.py:404-431 semantics).

    interpolation: "bilinear" (default; 4 gathers) or "lanczos4" — the
    reference's exact resampler (cv2.INTER_LANCZOS4, train.py:417),
    implemented and oracle-tested but 15x slower on TPU (64 scalar
    gathers: 1353 vs 89 ms per bs32×256² batch — a measured 10x detector
    train-step regression), so exact-parity callers opt in per run.
    DOCUMENTED DEVIATION: at the reference's mild affine magnitudes
    (scale 0.95-1.05) the resampler difference is statistically minor.

    p: apply probability — the reference's A.Affine has NO explicit p,
    so albumentations' default 0.5 applies (half the images unwarped).
    box_method: "largest_box" (corner AABB) or "ellipse" (the
    reference's rotate_method, train.py:422; see _transform_boxes)."""
    h, w, _ = image.shape
    kp, km = jax.random.split(key)
    fwd = _affine_matrix(km, h, w, degrees=degrees, scale=scale,
                         translate=translate, shear=shear)
    apply = (jnp.asarray(True) if p >= 1.0
             else jax.random.bernoulli(kp, p))
    inv = jnp.linalg.inv(fwd)
    if interpolation == "bilinear":
        out = _bilinear_warp(image, inv, variant=warp_variant)
    else:
        out = _WARPS[interpolation](image, inv)
    out = jnp.where(apply, out, image.astype(out.dtype))
    if boxes is None:
        return out
    new_boxes, new_mask = _transform_boxes(
        boxes, mask, fwd, h, w,
        min_visibility=min_visibility, min_area_px=min_area_px,
        method=box_method,
    )
    new_boxes = jnp.where(apply, new_boxes, boxes)
    new_mask = jnp.where(apply, new_mask, mask)
    return out, new_boxes, new_mask


def resize(image, size: int, *, method: str = "linear"):
    h, w, c = image.shape
    return jax.image.resize(image, (size, size, c), method=method)


def random_resized_crop(key, image, size: int, *, scale=(0.65, 1.0),
                        ratio=(3 / 4, 4 / 3)):
    """RandomResizedCrop via one fused scale_and_translate (no gather)."""
    h, w, c = image.shape
    ka, kr, kx, ky = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        kr, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    ch = jnp.sqrt(area / aspect) * h
    cw = jnp.sqrt(area * aspect) * w
    ch = jnp.minimum(ch, h)
    cw = jnp.minimum(cw, w)
    y0 = jax.random.uniform(ky, (), minval=0.0, maxval=1.0) * (h - ch)
    x0 = jax.random.uniform(kx, (), minval=0.0, maxval=1.0) * (w - cw)
    sc = jnp.array([size / ch, size / cw], jnp.float32)
    tr = jnp.array([-y0 * size / ch, -x0 * size / cw], jnp.float32)
    return jax.image.scale_and_translate(
        image, (size, size, c), (0, 1), sc, tr, method="linear"
    )


# ------------------------------------------------------------- pipelines


@dataclasses.dataclass(frozen=True)
class DetectionAugmentConfig:
    """Defaults are parameter-by-parameter parity with the reference's
    train pipeline (train.py:387-443); see tests/test_data.py's parity
    table."""

    image_size: int = 224
    # RandomShadow (train.py:396-401)
    shadow_p: float = 0.5
    shadow_num: tuple = (1, 3)
    shadow_intensity: tuple = (0.2, 0.7)
    shadow_roi: tuple = (0.0, 0.7, 1.0, 1.0)
    # HorizontalFlip / Affine (train.py:402,412-426)
    flip_p: float = 0.5
    # the reference's A.Affine carries NO explicit p → albumentations'
    # default 0.5: HALF the training images are never warped
    affine_p: float = 0.5
    degrees: float = 45.0
    scale: tuple = (0.95, 1.05)
    translate: float = 0.05
    shear: float = 15.0
    # rotate_method="ellipse" (train.py:422): rotated boxes take the
    # AABB of the transformed INSCRIBED ELLIPSE (tighter) instead of the
    # transformed corners' AABB ("largest_box")
    box_rotate_method: str = "ellipse"
    # ColorJitter (train.py:427-433)
    jitter_p: float = 0.6
    jitter_brightness: float = 0.1
    jitter_contrast: float = 0.15
    jitter_saturation: float = 0.2
    jitter_hue: float = 0.03
    # CoarseDropout (train.py:435-441)
    dropout_p: float = 0.25
    dropout_holes: tuple = (1, 3)
    dropout_size: tuple = (0.05, 0.12)
    dropout_fill: float = 1.0  # reference fill=255 → 1.0 in [0,1]
    # BboxParams (train.py:446)
    min_visibility: float = 0.1
    min_area_px: float = 1.0
    # Affine resample. The reference uses LANCZOS4 (train.py:417), which is
    # implemented ("lanczos4") and oracle-tested, but costs 15x on TPU
    # (gather-bound); see random_affine's docstring for the measurements.
    interpolation: str = "bilinear"
    # bilinear warp strategy ("" = ARSVT_WARP_VARIANT / module default).
    # Carried here so it keys the jit trace — benchmarks and A/B runs can
    # switch variants in-process (see _bilinear_warp's docstring).
    warp_variant: str = ""


@partial(jax.jit, static_argnames=("cfg",))
def detection_train_augment(key, image, boxes, mask,
                            cfg: DetectionAugmentConfig = DetectionAugmentConfig()):
    """Full reference train pipeline on one (canvas-sized) image."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    image = random_shadow(
        k1, image, p=cfg.shadow_p, num_shadows=cfg.shadow_num,
        intensity=cfg.shadow_intensity, roi=cfg.shadow_roi,
    )
    image, boxes = random_horizontal_flip(k2, image, boxes, p=cfg.flip_p)
    image, boxes, mask = random_affine(
        k3, image, boxes, mask, degrees=cfg.degrees, scale=cfg.scale,
        translate=cfg.translate, shear=cfg.shear,
        min_visibility=cfg.min_visibility, min_area_px=cfg.min_area_px,
        interpolation=cfg.interpolation, p=cfg.affine_p,
        box_method=cfg.box_rotate_method,
        warp_variant=cfg.warp_variant or None,
    )
    image = color_jitter(
        k4, image, p=cfg.jitter_p, brightness=cfg.jitter_brightness,
        contrast=cfg.jitter_contrast, saturation=cfg.jitter_saturation,
        hue=cfg.jitter_hue,
    )
    image = coarse_dropout(
        k5, image, p=cfg.dropout_p, num_holes=cfg.dropout_holes,
        hole_height=cfg.dropout_size, hole_width=cfg.dropout_size,
        fill=cfg.dropout_fill,
    )
    if image.shape[0] != cfg.image_size:
        image = resize(image, cfg.image_size)
    return normalize(image), boxes, mask


@dataclasses.dataclass(frozen=True)
class ClassifyAugmentConfig:
    image_size: int = 224
    flip_p: float = 0.5
    crop_scale: tuple = (0.65, 1.0)
    jitter_p: float = 0.0
    rand_augment: bool = False
    rand_augment_magnitude: float = 0.5
    # bilinear warp strategy for RandAugment's rotate (see
    # DetectionAugmentConfig.warp_variant)
    warp_variant: str = ""


@partial(jax.jit, static_argnames=("cfg",))
def classification_train_augment(key, image,
                                 cfg: ClassifyAugmentConfig = ClassifyAugmentConfig()):
    """Crop/flip fine-tune augmentation (BASELINE config #2), optional
    RandAugment (+ViT-L preset, config #4)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    image = random_resized_crop(k1, image, cfg.image_size,
                                scale=cfg.crop_scale)
    image = random_horizontal_flip(k2, image, p=cfg.flip_p)
    if cfg.jitter_p > 0:
        image = color_jitter(k3, image, p=cfg.jitter_p)
    if cfg.rand_augment:
        image = rand_augment(k4, image, magnitude=cfg.rand_augment_magnitude,
                             warp_variant=cfg.warp_variant or None)
    return normalize(image)


@partial(jax.jit, static_argnames=("size",))
def eval_preprocess(image, size: int = 224):
    """Resize(size) -> Normalize (train.py:482-489 / evaluation.py:360-366)."""
    if image.shape[0] != size or image.shape[1] != size:
        image = resize(image, size)
    return normalize(image)


# ------------------------------------------------------------ randaugment


def _ra_rotate(key, image, m, variant: str | None = None):
    return _ra_rotate_by_deg(image, _ra_sample_deg(key, m), variant=variant)


def _ra_posterize(key, image, m):
    bits = jnp.round(8.0 - 4.0 * m * jax.random.uniform(key, ()))
    levels = 2.0 ** bits
    return jnp.floor(image * levels) / levels


def _ra_solarize(key, image, m):
    thresh = 1.0 - m * jax.random.uniform(key, ())
    return jnp.where(image >= thresh, 1.0 - image, image)


def _ra_brightness(key, image, m):
    f = 1.0 + (jax.random.uniform(key, (), minval=-1.0, maxval=1.0)) * 0.8 * m
    return jnp.clip(adjust_brightness(image, f), 0.0, 1.0)


def _ra_contrast(key, image, m):
    f = 1.0 + (jax.random.uniform(key, (), minval=-1.0, maxval=1.0)) * 0.8 * m
    return jnp.clip(adjust_contrast(image, f), 0.0, 1.0)


def _ra_color(key, image, m):
    f = 1.0 + (jax.random.uniform(key, (), minval=-1.0, maxval=1.0)) * 0.8 * m
    return jnp.clip(adjust_saturation(image, f), 0.0, 1.0)


def _ra_identity(key, image, m):
    return image


_RA_OPS = (_ra_rotate, _ra_posterize, _ra_solarize, _ra_brightness,
           _ra_contrast, _ra_color, _ra_identity)


def _ra_rotate_by_deg(image, deg, variant: str | None = None):
    """Rotate about the image center by `deg` (the warp `_ra_rotate` applies,
    with the angle passed in instead of sampled)."""
    h, w, _ = image.shape
    theta = jnp.deg2rad(deg)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.eye(3).at[0, 0].set(cos).at[0, 1].set(-sin)
    rot = rot.at[1, 0].set(sin).at[1, 1].set(cos)
    center = jnp.eye(3).at[0, 2].set(w / 2.0).at[1, 2].set(h / 2.0)
    uncenter = jnp.eye(3).at[0, 2].set(-w / 2.0).at[1, 2].set(-h / 2.0)
    fwd = center @ rot @ uncenter
    return _bilinear_warp(image, jnp.linalg.inv(fwd), variant=variant)


def _ra_sample_deg(key, m):
    """The angle draw `_ra_rotate` makes from its param key."""
    return jax.random.uniform(key, (), minval=-1.0, maxval=1.0) * 30.0 * m


def rand_augment(key, image, *, num_ops: int = 2, magnitude: float = 0.5,
                 warp_variant: str | None = None):
    """RandAugment: `num_ops` randomly chosen ops at shared magnitude.

    TPU cost note: this runs vmapped per image, and under `vmap` a
    `lax.switch` executes EVERY branch and selects — so the naive
    op-loop pays the full rotate warp (the only non-pointwise op, and
    ~the entire pipeline cost at 384px) once per round for every image,
    selected or not. For the default `num_ops=2` we instead emit
    `P2 ∘ W(θ1+θ2) ∘ P1`, where round r contributes either a pointwise
    op `Pr` (θr = 0) or a rotation (Pr = identity): bit-identical to the
    sequential loop whenever ≤1 round draws rotate (48/49 of images;
    W(0) is an exact identity for every warp variant — tested), and a
    single-resample of the mathematically identical composed rotation
    when both rounds draw it (rotations about a shared center compose
    additively). One warp per image instead of `num_ops`.
    """
    ops = tuple(
        partial(_ra_rotate, variant=warp_variant) if op is _ra_rotate else op
        for op in _RA_OPS
    )
    if num_ops == 2:
        rot_idx = _RA_OPS.index(_ra_rotate)
        # identical key stream to the sequential loop below
        key, kop1, kp1 = jax.random.split(key, 3)
        idx1 = jax.random.randint(kop1, (), 0, len(ops))
        key, kop2, kp2 = jax.random.split(key, 3)
        idx2 = jax.random.randint(kop2, (), 0, len(ops))
        deg = (
            jnp.where(idx1 == rot_idx, _ra_sample_deg(kp1, magnitude), 0.0)
            + jnp.where(idx2 == rot_idx, _ra_sample_deg(kp2, magnitude), 0.0)
        )
        pointwise = tuple(
            _ra_identity if op is _ra_rotate else op for op in _RA_OPS
        )

        def pointwise_switch(idx, kparam, img):
            branches = [
                (lambda im, op=op, kp=kparam: op(kp, im, magnitude))
                for op in pointwise
            ]
            return jax.lax.switch(idx, branches, img)

        image = pointwise_switch(idx1, kp1, image)
        image = _ra_rotate_by_deg(image, deg, variant=warp_variant)
        image = pointwise_switch(idx2, kp2, image)
        return image
    for _ in range(num_ops):
        key, kop, kparam = jax.random.split(key, 3)
        idx = jax.random.randint(kop, (), 0, len(ops))
        branches = [
            (lambda img, op=op, kp=kparam: op(kp, img, magnitude))
            for op in ops
        ]
        image = jax.lax.switch(idx, branches, image)
    return image
