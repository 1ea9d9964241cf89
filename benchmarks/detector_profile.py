"""Itemized detector train-step profile (VERDICT round-3 #3).

The reference's exact detector config (deit_detector_ref: DeiT-400d/12L,
25 heads -> head_dim=16, 5 queries, bs32 — /root/reference/train.py:
1345-1352) measures ~228 img/s while ViT-B reaches 988; nobody has shown
whether 228 is near the geometry's ceiling or 2x away. This decomposes
the 140 ms step by subtraction (the tunnel-safe alternative to
jax.profiler, like benchmarks/step_profile.py):

  A  encoder fwd only (backbone, loss=mean)     -> encoder forward
  B  full detector fwd (decoder+heads+triplet)  -> + decoder      = B - A
  C  B + detection loss (matcher, aux loss)     -> + matcher/loss = C - B
  D  value_and_grad of C                        -> + backward     = D - C
  E  the real train_step (augment + fused AdamW)-> + aug/opt      = E - D

and A/Bs the encoder attention path at this geometry:

  attn=flash  per-(batch-block, head) Pallas grid (the default): 50 grid
              cells of (16, 198, 16) work — each head's score matmul has
              K=16 in a 128-lane tile, 1/8 MXU utilization
  attn=jnp    ARSVT_ATTN_JNP=1 — XLA batched-matmul lowering (same lane
              tax, no Pallas grid dispatch, scores round-trip HBM)

Shape-roofline context printed alongside: padded-effective FLOPs count
every matmul dim rounded to its MXU tile (K,N -> 128, M -> 8), so the
"ceiling" row is what this geometry can physically reach — D=400 pads to
512 (+28%) on every GEMM and head_dim=16 pads to 128 (8x) on every score
matmul, neither of which any kernel on this hardware avoids.

Run on the TPU chip:  python benchmarks/detector_profile.py
Env: PROFILE_BS (default 32, the reference's), PROFILE_ATTN_DROPOUT
(default 0.1, the faithful value; 0 removes in-kernel dropout cost).
Prints one JSON dict at the end; merge into PERFORMANCE.md by hand.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

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

from arsvt_tpu.core.dtypes import DEFAULT_POLICY
from arsvt_tpu.models.detector import apply_detector, init_detector
from arsvt_tpu.objectives.detection_loss import (
    DetectionLossConfig,
    detection_loss,
)
from arsvt_tpu.objectives.matcher import MatcherConfig
from arsvt_tpu.train.config import TRAIN_PRESETS, resolve_detector
from arsvt_tpu.train.detect_step import make_detector_step_fns

BS = int(os.environ.get("PROFILE_BS", "32"))
ATTN_DROPOUT = float(os.environ.get("PROFILE_ATTN_DROPOUT", "0.1"))
STEPS = 15


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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


def _pad(n, t):
    return -(-n // t) * t


def padded_flops_fwd(det_cfg, bs):
    """Padded-effective forward FLOPs: each GEMM dim rounded to its MXU
    tile (contraction/lane -> 128, sublane -> 8). This is the work the
    systolic array actually clocks through for this geometry."""
    bb = det_cfg.backbone
    s = (bb.image_size // bb.patch_size) ** 2 + bb.num_special_tokens
    d, mlp, h = bb.embed_dim, bb.mlp_dim, bb.num_heads
    hd = d // h
    dp, mlpp = _pad(d, 128), _pad(mlp, 128)
    sp, hdp = _pad(s, 128), _pad(hd, 128)
    m = _pad(bs * s, 8)
    enc_layer = (
        2 * m * dp * _pad(3 * d, 128)          # qkv
        + 2 * bs * h * _pad(s, 8) * hdp * sp   # scores (K=hd -> 128 tax)
        + 2 * bs * h * _pad(s, 8) * sp * hdp   # probs @ V
        + 2 * m * dp * dp                      # out proj
        + 2 * m * dp * mlpp + 2 * m * mlpp * dp  # MLP
    )
    useful_layer = (
        2 * bs * s * d * 3 * d + 2 * bs * h * s * hd * s * 2
        + 2 * bs * s * d * d + 4 * bs * s * d * mlp
    )
    hc = det_cfg.head
    q, sk = hc.num_queries, s - bb.num_special_tokens
    mq = _pad(bs * q, 8)
    mk = _pad(bs * sk, 8)
    dec_layer = (
        2 * mq * dp * _pad(3 * d, 128)       # self qkv (tiny)
        + 2 * mq * dp * dp                   # cross q proj
        + 2 * mk * dp * _pad(2 * d, 128)     # cross kv proj
        + 2 * bs * hc.num_heads * _pad(q, 8) * _pad(d // hc.num_heads, 128)
        * _pad(sk, 128) * 2                  # cross scores + @V
        + 2 * mq * dp * dp                   # out proj
        + 2 * mq * dp * _pad(hc.ffn_dim, 128)
        + 2 * mq * _pad(hc.ffn_dim, 128) * dp
    )
    n_enc, n_dec = bb.depth, hc.depth
    return {
        "encoder_padded": n_enc * enc_layer,
        "encoder_useful": n_enc * useful_layer,
        "decoder_padded": n_dec * dec_layer,
        "seq": s,
    }


def main():
    cfg = TRAIN_PRESETS["deit_detector_ref"].with_overrides(
        batch_size=BS, attn_dropout=ATTN_DROPOUT
    )
    det_cfg = resolve_detector(cfg)
    policy = DEFAULT_POLICY
    params = init_detector(jax.random.PRNGKey(0), det_cfg)
    loss_cfg = DetectionLossConfig(
        num_classes=det_cfg.head.num_classes,
        background_weight=cfg.background_weight,
        w_ce=cfg.w_ce, w_bbox=cfg.w_bbox, w_giou=cfg.w_giou,
        w_triplet=cfg.w_triplet, triplet_margin=cfg.triplet_margin,
        matcher=MatcherConfig(),
    )
    rng = jax.random.PRNGKey(1)
    r = np.random.default_rng(0)
    images = jnp.asarray(
        r.uniform(size=(BS, 224, 224, 3)).astype(np.float32))
    m = cfg.max_objects
    # 2 valid boxes per image, xyxy normalized, non-degenerate
    x1 = r.uniform(0.05, 0.5, (BS, m)).astype(np.float32)
    y1 = r.uniform(0.05, 0.5, (BS, m)).astype(np.float32)
    boxes = jnp.asarray(np.stack(
        [x1, y1, x1 + 0.3, y1 + 0.3], axis=-1))
    labels = jnp.asarray(r.integers(0, 6, (BS, m)), jnp.int32)
    mask = jnp.asarray(
        np.arange(m)[None, :] < 2).repeat(BS, 0)
    targets = {"boxes": boxes, "labels": labels, "mask": mask}

    def enc_fwd(p, images, rng):
        from arsvt_tpu.models.vit import apply_backbone

        cp = policy.cast_to_compute(p)
        toks = apply_backbone(
            cp["backbone"], images.astype(policy.compute_dtype),
            det_cfg.backbone, train=True, rng=rng,
            remat=cfg.remat, remat_policy=cfg.remat_policy,
        )
        return jnp.mean(toks.astype(jnp.float32))

    def det_fwd(p, images, rng):
        cp = policy.cast_to_compute(p)
        out, feats = apply_detector(
            cp, images.astype(policy.compute_dtype), det_cfg,
            train=True, rng=rng, return_features=True,
            remat=cfg.remat, remat_policy=cfg.remat_policy,
            return_aux=cfg.aux_loss,
        )
        out.pop("aux", None)
        return (jnp.mean(out["class_logits"])
                + jnp.mean(out["boxes_cxcywh"])
                + jnp.mean(feats))

    def loss_fwd(p, images, rng):
        cp = policy.cast_to_compute(p)
        out, feats = apply_detector(
            cp, images.astype(policy.compute_dtype), det_cfg,
            train=True, rng=rng, return_features=True,
            remat=cfg.remat, remat_policy=cfg.remat_policy,
            return_aux=cfg.aux_loss,
        )
        aux = out.pop("aux", None)
        total, _ = detection_loss(out, targets, loss_cfg, feats)
        if aux is not None:
            aux_totals = jax.vmap(
                lambda cl, bx: detection_loss(
                    {"class_logits": cl, "boxes_cxcywh": bx},
                    targets, loss_cfg,
                )[0]
            )(aux["class_logits"], aux["boxes_cxcywh"])
            total = total + jnp.sum(aux_totals)
        return total

    result = {"bs": BS, "attn_dropout": ATTN_DROPOUT,
              "backend": jax.default_backend()}

    fl = padded_flops_fwd(det_cfg, BS)
    result["flops"] = fl
    log(f"padded-effective fwd: encoder {fl['encoder_padded']/1e9:.1f} G "
        f"(useful {fl['encoder_useful']/1e9:.1f} G) "
        f"decoder {fl['decoder_padded']/1e9:.1f} G")

    t_a = timeit(jax.jit(enc_fwd), params, images, rng,
                 sync=lambda o: float(o))
    log(f"A encoder fwd:      {t_a:7.1f} ms")
    t_b = timeit(jax.jit(det_fwd), params, images, rng,
                 sync=lambda o: float(o))
    log(f"B + decoder/heads:  {t_b:7.1f} ms  (decoder {t_b - t_a:.1f})")
    t_c = timeit(jax.jit(loss_fwd), params, images, rng,
                 sync=lambda o: float(o))
    log(f"C + matcher/loss:   {t_c:7.1f} ms  (loss {t_c - t_b:.1f})")
    t_d = timeit(jax.jit(jax.value_and_grad(loss_fwd)), params, images, rng,
                 sync=lambda o: float(o[0]))
    log(f"D value_and_grad:   {t_d:7.1f} ms  (backward {t_d - t_c:.1f})")

    init_fn, train_step, _ = make_detector_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    batch = {"image": images, "boxes": boxes, "labels": labels,
             "mask": mask}

    def step(state):
        state, metrics = train_step(state, batch, rng)
        return state, metrics

    # donated state: rebuild per timing by running through; time via loop
    s2, metrics = step(state)
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 0
    s = s2
    for _ in range(STEPS):
        s, metrics = step(s)
        n += 1
    float(metrics["loss"])
    t_e = (time.perf_counter() - t0) / n * 1e3
    log(f"E full train_step:  {t_e:7.1f} ms  (aug+opt {t_e - t_d:.1f})"
        f"  -> {BS / t_e * 1e3:.1f} img/s")

    result.update(
        a_encoder_fwd_ms=round(t_a, 2), b_full_fwd_ms=round(t_b, 2),
        c_fwd_loss_ms=round(t_c, 2), d_grad_ms=round(t_d, 2),
        e_train_step_ms=round(t_e, 2),
        img_per_s=round(BS / t_e * 1e3, 1),
    )
    # padded-roofline ceiling for the step: fwd + 2x fwd backward on the
    # padded-effective FLOPs at the chip's bf16 peak
    peak = 197e12
    step_padded = 3 * (fl["encoder_padded"] + fl["decoder_padded"])
    result["ceiling_img_per_s_at_peak"] = round(
        BS / (step_padded / peak) / 1e0, 1)

    log("--- attention path A/B (same process, env flips at trace time)")
    os.environ["ARSVT_ATTN_JNP"] = "1"
    try:
        t_a2 = timeit(jax.jit(enc_fwd), params, images, rng,
                      sync=lambda o: float(o))
        log(f"A' encoder fwd, jnp attn:   {t_a2:7.1f} ms")
        t_d2 = timeit(jax.jit(jax.value_and_grad(loss_fwd)), params,
                      images, rng, sync=lambda o: float(o[0]))
        log(f"D' value_and_grad, jnp attn:{t_d2:7.1f} ms")
        init2, step2, _ = make_detector_step_fns(cfg, mesh=None)
        st = init2(jax.random.PRNGKey(0))
        st, mtr = step2(st, batch, rng)
        float(mtr["loss"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            st, mtr = step2(st, batch, rng)
        float(mtr["loss"])
        t_e2 = (time.perf_counter() - t0) / STEPS * 1e3
        log(f"E' full train_step, jnp attn:{t_e2:6.1f} ms"
            f"  -> {BS / t_e2 * 1e3:.1f} img/s")
        result.update(
            a_encoder_fwd_jnp_attn_ms=round(t_a2, 2),
            d_grad_jnp_attn_ms=round(t_d2, 2),
            e_train_step_jnp_attn_ms=round(t_e2, 2),
            img_per_s_jnp_attn=round(BS / t_e2 * 1e3, 1),
        )
    finally:
        del os.environ["ARSVT_ATTN_JNP"]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
