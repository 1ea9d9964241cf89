"""Affine-warp gather-strategy micro-bench (VERDICT round-3 #3 follow-on).

The bilinear affine warp is the detection augmentation's dominant cost
(~89 ms per bs32x256² batch with the original "taps" variant — most of
the ~140 ms reference-config detector step; augment.py docstring). The
three variants compute identical results (tests/test_data.py::
test_bilinear_warp_variants_identical) and differ only in how the four
taps reach HBM:

  taps   4 independent 2-D gathers (the original)
  flat   4 linear-index 1-D gathers into the (H*W, C) flattened image
  patch  1 lax.gather of (2,2,C) patches + elementwise corner selects

Also times the full detection_train_augment under each variant, and the
lanczos4 warp for scale. Run ON THE CHIP:

    python benchmarks/warp_bench.py [--bs 32] [--size 224]

Prints one JSON dict; the winner becomes the ARSVT_WARP_VARIANT default.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, steps=20):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    from arsvt_tpu.data.augment import (
        _BILINEAR_VARIANTS,
        _affine_matrix,
        _lanczos4_warp,
        DetectionAugmentConfig,
        detection_train_augment,
    )

    b, s = args.bs, args.size
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        size=(b, s, s, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(1), b)

    def warp_batch(fn):
        def one(key, img):
            fwd = _affine_matrix(key, s, s, degrees=45.0,
                                 scale=(0.95, 1.05), translate=0.05,
                                 shear=15.0)
            return fn(img, jnp.linalg.inv(fwd))

        return jax.jit(jax.vmap(one))

    result = {"bs": b, "size": s, "backend": jax.default_backend()}
    for name, fn in _BILINEAR_VARIANTS.items():
        ms = timeit(warp_batch(fn), keys, imgs)
        result[f"warp_{name}_ms"] = round(ms, 2)
        log(f"warp {name:6s}: {ms:8.2f} ms / batch")
    # bf16 input halves the gathered bytes — if the gather is
    # byte-bound (not index-bound) this is another ~2x on the table
    imgs16 = imgs.astype(jnp.bfloat16)
    for name, fn in _BILINEAR_VARIANTS.items():
        ms = timeit(warp_batch(fn), keys, imgs16)
        result[f"warp_{name}_bf16_ms"] = round(ms, 2)
        log(f"warp {name:6s} (bf16): {ms:8.2f} ms / batch")
    ms = timeit(warp_batch(_lanczos4_warp), keys, imgs)
    result["warp_lanczos4_ms"] = round(ms, 2)
    log(f"warp lanczos4: {ms:7.2f} ms / batch")

    # full detection augmentation (shadow+flip+affine+jitter+dropout+
    # normalize) per variant — what the detector step actually pays
    boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]), (b, 4, 1))
    mask = jnp.ones((b, 4), bool)

    # The variant must ride the STATIC config, not an env var: the round-4
    # artifact set ARSVT_WARP_VARIANT around a module-level-jitted
    # detection_train_augment whose trace cache is keyed on (shapes, cfg)
    # only, so all four rows re-served the first variant's compiled code
    # (warpbench.log: ~56 ms for every variant while the in-step profile
    # showed a 48 ms swing). warp_variant is a cfg field now.
    def aug_batch_for(cfg):
        def aug_batch(keys, imgs, boxes, mask):
            return jax.vmap(
                lambda k, im, bx, ms_: detection_train_augment(
                    k, im, bx, ms_, cfg)
            )(keys, imgs, boxes, mask)

        return aug_batch

    for name in _BILINEAR_VARIANTS:
        vcfg = DetectionAugmentConfig(image_size=s, warp_variant=name)
        ms = timeit(jax.jit(aug_batch_for(vcfg)), keys, imgs, boxes, mask)
        result[f"full_augment_{name}_ms"] = round(ms, 2)
        log(f"full detection augment [{name:6s}]: {ms:8.2f} ms / batch")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
