"""Itemized train-step profile (VERDICT round-1 next #2).

Times four nested variants of the ViT-B/16 bs256 train step so each
component's cost falls out by subtraction — the tunnel-safe alternative to
jax.profiler (whose device traces don't cross the axon tunnel):

  A fwd-only loss            -> forward
  B value_and_grad           -> + backward (+remat recompute)  = B - A
  C B + AdamW update         -> + optimizer                    = C - B
  D C + fused augmentation   -> + augmentation                 = D - C

plus the isolated flash-attention kernels (x12 layers) to attribute the
attention share of A and B. Sync via float() (block_until_ready is a no-op
through the tunnel). Prints one JSON dict at the end.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arsvt_tpu.core.dtypes import DEFAULT_POLICY
from arsvt_tpu.models.classifier import (
    apply_image_classifier,
    init_image_classifier,
)
from arsvt_tpu.objectives.classification import softmax_cross_entropy
from arsvt_tpu.train.config import TrainConfig, resolve_backbone
from arsvt_tpu.train.optim import make_optimizer
from arsvt_tpu.train.train_step import make_classifier_step_fns

BS = int(os.environ.get("PROFILE_BS", "256"))
_REMAT = os.environ.get("PROFILE_REMAT", "all_but_mlp")  # "none" disables
STEPS = 15


def timeit(fn, *args, steps=STEPS, sync):
    out = fn(*args)
    sync(out)
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    cfg = TrainConfig(preset="vit_base_16_224", batch_size=BS, bf16=True,
                      augment="none", canvas=224, total_steps=10**6,
                      remat=_REMAT != "none", remat_policy=_REMAT)
    bb = resolve_backbone(cfg)
    policy = DEFAULT_POLICY
    params = init_image_classifier(jax.random.PRNGKey(0), bb, 6)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(1)
    images = jnp.asarray(np.random.default_rng(0).uniform(
        size=(BS, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(np.random.default_rng(1).integers(0, 6, (BS,)),
                         jnp.int32)

    def loss_fn(p, images, labels, rng):
        cp = policy.cast_to_compute(p)
        logits = apply_image_classifier(
            cp, images.astype(policy.compute_dtype), bb, 6,
            train=True, rng=rng, remat=cfg.remat,
            remat_policy=cfg.remat_policy)
        return softmax_cross_entropy(logits, labels, num_classes=6)

    # A: forward only
    fwd = jax.jit(loss_fn)
    t_a = timeit(fwd, params, images, labels, rng, sync=lambda o: float(o))
    print(f"A fwd-only:        {t_a:7.1f} ms", file=sys.stderr, flush=True)

    # B: + backward
    grad = jax.jit(jax.value_and_grad(loss_fn))
    t_b = timeit(grad, params, images, labels, rng,
                 sync=lambda o: float(o[0]))
    print(f"B fwd+bwd:         {t_b:7.1f} ms", file=sys.stderr, flush=True)

    # C: + optimizer (no donation to keep state reusable across calls)
    import optax

    @jax.jit
    def full(p, os_, images, labels, rng):
        loss, g = jax.value_and_grad(loss_fn)(p, images, labels, rng)
        updates, os2 = optimizer.update(g, os_, p)
        return loss, optax.apply_updates(p, updates), os2

    t_c = timeit(full, params, opt_state, images, labels, rng,
                 sync=lambda o: float(o[0]))
    print(f"C +optimizer:      {t_c:7.1f} ms", file=sys.stderr, flush=True)

    # D: + fused augmentation (the bench config: 256-canvas crop/flip)
    cfg_d = cfg.with_overrides(augment="crop_flip", canvas=256)
    init_fn, train_step, _ = make_classifier_step_fns(cfg_d, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    batch = {"image": jnp.asarray(np.random.default_rng(0).uniform(
                 size=(BS, 256, 256, 3)).astype(np.float32)),
             "label": labels}

    def step(state):
        return train_step(state, batch, rng)

    state, m = step(state)
    float(m["loss"])
    state, m = step(state)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state)
    float(m["loss"])
    t_d = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"D full step (aug): {t_d:7.1f} ms", file=sys.stderr, flush=True)

    # isolated flash kernels at ViT-B shapes, x12 layers
    from arsvt_tpu.ops.pallas.flash_attention import flash_attention

    q = jnp.asarray(np.random.default_rng(2).normal(
        size=(BS, 12, 197, 64)), jnp.bfloat16)

    fa = jax.jit(lambda q: flash_attention(q, q, q))
    t_fa = timeit(fa, q, sync=lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))

    fab = jax.jit(jax.grad(
        lambda q: jnp.sum(flash_attention(q, q, q).astype(jnp.float32) ** 2)))
    t_fab = timeit(fab, q, sync=lambda o: float(o[0, 0, 0, 0].astype(jnp.float32)))
    print(f"flash fwd x1 layer: {t_fa:6.2f} ms; fwd+bwd: {t_fab:6.2f} ms",
          file=sys.stderr, flush=True)

    # the production path: fused qkv-proj->attention->out-proj block
    from arsvt_tpu.ops.pallas.flash_attention import fused_encoder_attention

    d = bb.embed_dim
    y = jnp.asarray(np.random.default_rng(3).normal(
        size=(BS, bb.seq_len, d)) * 0.02, jnp.bfloat16)
    wqkv = jnp.asarray(np.random.default_rng(4).normal(
        size=(d, 3 * d)) * 0.02, jnp.bfloat16)
    wproj = jnp.asarray(np.random.default_rng(5).normal(
        size=(d, d)) * 0.02, jnp.bfloat16)
    bq = jnp.zeros((3 * d,), jnp.bfloat16)
    bp = jnp.zeros((d,), jnp.bfloat16)

    feb = jax.jit(lambda y: fused_encoder_attention(
        y, wqkv, bq, wproj, bp, bb.num_heads))
    t_fe = timeit(feb, y, sync=lambda o: float(o[0, 0, 0].astype(jnp.float32)))
    febb = jax.jit(jax.grad(lambda y: jnp.sum(fused_encoder_attention(
        y, wqkv, bq, wproj, bp, bb.num_heads).astype(jnp.float32) ** 2)))
    t_feb = timeit(febb, y,
                   sync=lambda o: float(o[0, 0, 0].astype(jnp.float32)))
    print(f"fused attn block x1 layer: fwd {t_fe:6.2f} ms; "
          f"fwd+bwd {t_feb:6.2f} ms", file=sys.stderr, flush=True)

    result = {
        "batch_size": BS,
        "fwd_ms": round(t_a, 1),
        "bwd_plus_remat_ms": round(t_b - t_a, 1),
        "optimizer_ms": round(t_c - t_b, 1),
        # D differs from C by the fused augmentation AND donation; the
        # batch is a device-resident array staged once, so NO per-step
        # H2D is inside this number (the production path additionally
        # ships uint8 batches — see datafed_bench.py for the fed rate).
        # The difference is an upper bound that can go slightly negative
        # when donation savings exceed the augment cost
        "augmentation_and_step_overhead_ms": round(t_d - t_c, 1),
        "full_step_ms": round(t_d, 1),
        "img_per_s": round(BS / t_d * 1e3, 1),
        "flash_fwd_per_layer_ms": round(t_fa, 2),
        "flash_fwdbwd_per_layer_ms": round(t_fab, 2),
        "fused_block_fwd_per_layer_ms": round(t_fe, 2),
        "fused_block_fwdbwd_per_layer_ms": round(t_feb, 2),
        "attention_share_of_step": round(12 * t_feb / t_d, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
