"""ViT-L/16@384 (BASELINE config #5 sibling — config #4) roofline account.

VERDICT round-4 #5: config #4 had a number (48.8 img/s, BENCH_r04) but no
roofline account like ViT-B's — is that 90% of the 384-canvas ceiling or
2x away? This bench gives it the ViT-B treatment:

1. chip calibration at ViT-L@384 matmul shapes (D=1024 contractions,
   S=577 attention) — the shape-specific ceiling, FLOP-weighted across
   the step's matmul population (the 108 TFLOP/s ViT-B number came from
   the same method at D=768, PERFORMANCE.md "Chip calibration");
2. ceiling img/s = ceiling TFLOP/s / analytic per-image train FLOPs
   (utils/flops.py, same bench config as bench.py: bs32, accum 2,
   no remat => 3x fwd);
3. step decomposition: full RandAugment train step vs augment="none"
   step vs the jitted augment alone, for warp_variant in
   {taps, shear_matmul} — RandAugment's rotate arm executes for every
   image under the vmapped lax.switch, so the affine warp tax rides
   every step (warpbench384: taps 194 ms vs shear 23.6 ms per bs32
   batch at 384px).

Emits vitl_roofline.json at the repo root.

NOTE: jax.block_until_ready is a no-op through the axon tunnel — all
timings sync via a scalar device_get.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arsvt_tpu.models.registry import get_preset
from arsvt_tpu.utils.flops import backbone_fwd_gflops

BS = 32
STEPS = 10


def log(*a):
    print(*a, flush=True)


def sync(x):
    jax.device_get(jnp.sum(x) if hasattr(x, "dtype") else x)


def time_chain(step_fn, carry0, flops_per_iter, iters=40):
    """TFLOP/s of a matmul pair chained through a lax.scan carry.

    One jit dispatch for `iters` iterations: amortizes the axon tunnel's
    per-call dispatch floor (~1.5 ms — the first version of this bench
    timed single calls and read 22 TFLOP/s for an attn_out-shaped GEMM,
    a dispatch artifact, not physics). The carry feeds each iteration so
    XLA cannot hoist the loop-invariant matmuls."""
    import jax.lax as lax

    def body(carry, _):
        return step_fn(carry), None

    f = jax.jit(lambda c: lax.scan(body, c, None, length=iters)[0])
    sync(f(carry0))
    t0 = time.perf_counter()
    out = f(carry0)
    sync(out)
    dt = time.perf_counter() - t0
    return flops_per_iter * iters / dt / 1e12


def calibrate(bb):
    """FLOP-weighted matmul ceiling for one fwd pass of the backbone.

    Each row times a round-trip PAIR of GEMMs (d->K then K->d) so the
    carry keeps a fixed shape; the pair covers both contraction depths
    the layer actually runs. The attention row is the real qkT+pv pair
    at (S, head_dim) geometry."""
    s, d, mlp, h = bb.seq_len, bb.embed_dim, bb.mlp_dim, bb.num_heads
    dh = d // h
    rows = BS * s
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)

    def dense_pair(name, width, f_img_pair):
        w1 = jax.random.normal(ks[0], (d, width), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(ks[1], (width, d), jnp.bfloat16) * 0.02
        x0 = jax.random.normal(ks[2], (rows, d), jnp.bfloat16)
        flops_iter = 2 * rows * d * width * 2
        r = time_chain(lambda x: (x @ w1) @ w2, x0, flops_iter)
        return name, r, f_img_pair

    def attn_pair():
        q = jax.random.normal(ks[3], (BS * h, s, dh), jnp.bfloat16)
        kv = jax.random.normal(ks[4], (BS * h, s, dh), jnp.bfloat16) * 0.02

        def step(x):
            scores = jnp.einsum("bij,bkj->bik", x, kv)
            return jnp.einsum("bik,bkj->bij", scores, kv) * 0.02

        flops_iter = 2 * BS * h * s * s * dh * 2
        r = time_chain(step, q, flops_iter)
        return "qkT+pv", r, 2 * s * s * d * 2

    # weights = the REAL per-layer fwd matmul FLOPs each row's measured
    # rate stands for (the chain's synthetic return leg is rate-only)
    rows_out = [
        dense_pair("qkv(d->3d)", 3 * d, 2 * s * d * 3 * d),
        dense_pair("attn_out(d->d)", d, 2 * s * d * d),
        dense_pair("fc1+fc2", mlp, 2 * s * d * mlp * 2),
        attn_pair(),
    ]
    total_f = 0.0
    total_t = 0.0
    per_shape = {}
    for name, r, f_img in rows_out:
        per_shape[name] = round(r, 1)
        f = f_img * bb.depth
        total_f += f
        total_t += f / (r * 1e12)
        log(f"  {name:20s}: {r:6.1f} TFLOP/s")
    ceiling = total_f / total_t / 1e12
    log(f"  FLOP-weighted fwd matmul ceiling: {ceiling:.1f} TFLOP/s")
    return ceiling, per_shape


def build_step(warp_variant: str, augment: str):
    from arsvt_tpu.train.config import TRAIN_PRESETS, input_canvas
    from arsvt_tpu.train.train_step import make_classifier_step_fns

    cfg = TRAIN_PRESETS["vit_large_384"].with_overrides(
        batch_size=BS, grad_accum=2, remat=False, augment=augment,
        warp_variant=warp_variant,
    )
    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    # input_canvas: 416 letterbox for augmented configs (the step crops
    # to 384 on device), the model's native 384 for augment="none" — the
    # first run fed 416 to the bare model and hit the pos-embed guard
    size = input_canvas(cfg)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, size=(BS, size, size, 3), dtype=np.uint8
            )
        ),
        "label": jnp.asarray(
            np.random.default_rng(1).integers(0, 6, size=(BS,)), jnp.int32
        ),
    }
    return cfg, state, train_step, batch


def time_step(state, train_step, batch):
    rng = jax.random.PRNGKey(1)
    state, m = train_step(state, batch, rng)
    float(m["loss"])
    state, m = train_step(state, batch, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = train_step(state, batch, rng)
    float(m["loss"])
    return (time.perf_counter() - t0) / STEPS * 1e3


def time_augment_only(warp_variant: str):
    from arsvt_tpu.data.augment import (
        ClassifyAugmentConfig,
        classification_train_augment,
    )

    bb = get_preset("vit_large_16_384")
    acfg = ClassifyAugmentConfig(
        image_size=bb.image_size, rand_augment=True,
        warp_variant=warp_variant,
    )
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, size=(BS, 416, 416, 3), dtype=np.uint8
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(0), BS)

    @jax.jit
    def aug(keys, imgs):
        return jax.vmap(
            lambda k, im: classification_train_augment(k, im, acfg)
        )(keys, imgs)

    sync(aug(keys, imgs))
    t0 = time.perf_counter()
    out = None
    for _ in range(STEPS):
        out = aug(keys, imgs)
    sync(out)
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    bb = get_preset("vit_large_16_384")
    fwd_g = backbone_fwd_gflops(bb) + 2 * bb.embed_dim * 6 / 1e9
    train_g = fwd_g * 3.0  # bench config: no remat => fwd + 2x-fwd bwd
    log(f"ViT-L/16@384: fwd {fwd_g:.1f} GFLOP/img, "
        f"train {train_g:.1f} GFLOP/img (no-remat basis)")

    log("chip calibration at ViT-L@384 shapes:")
    ceiling_tflops, per_shape = calibrate(bb)
    ceiling_ips = ceiling_tflops * 1e3 / train_g

    result = {
        "preset": "vit_large_384 (BASELINE config #4)",
        "bench_config": f"bs{BS} as 2 scan microbatches, no remat, bf16",
        "fwd_gflops_per_image": round(fwd_g, 1),
        "train_gflops_per_image": round(train_g, 1),
        "matmul_tflops_by_shape": per_shape,
        "shape_ceiling_tflops": round(ceiling_tflops, 1),
        "chip_roofline_images_per_sec": round(ceiling_ips, 1),
    }

    decomp = {}
    for variant in ("taps", "shear_matmul"):
        aug_ms = time_augment_only(variant)
        cfg, state, step, batch = build_step(variant, "randaugment")
        full_ms = time_step(state, step, batch)
        decomp[variant] = {
            "train_step_ms": round(full_ms, 1),
            "images_per_sec": round(BS / full_ms * 1e3, 1),
            "augment_only_ms": round(aug_ms, 1),
        }
        log(f"[{variant}] step {full_ms:.1f} ms = "
            f"{BS / full_ms * 1e3:.1f} img/s "
            f"(augment alone {aug_ms:.1f} ms)")
        del state
    cfg, state, step, batch = build_step("", "none")
    noaug_ms = time_step(state, step, batch)
    del state
    log(f"[no augment] step {noaug_ms:.1f} ms = "
        f"{BS / noaug_ms * 1e3:.1f} img/s")

    result["step_decomposition"] = decomp
    result["no_augment_step_ms"] = round(noaug_ms, 1)
    for variant, row in decomp.items():
        ips = row["images_per_sec"]
        result[f"pct_of_roofline_{variant}"] = round(
            ips / ceiling_ips * 100, 1
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vitl_roofline.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    log(json.dumps(result))


if __name__ == "__main__":
    main()
