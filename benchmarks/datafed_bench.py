"""Data-fed end-to-end throughput (VERDICT round-2 #5).

bench.py's headline reuses one in-memory batch (chip-bound images/sec).
This harness runs the REAL pipeline — JPEGs on disk → C++ thread-pool
decode+letterbox (native/arsvt_loader.cpp) → background prefetch → uint8
H2D → jitted ViT-B/16 train step — and reports three rates plus the
starvation model that connects them:

  loader_only   images/sec the host pipeline sustains with no training
  step_only     images/sec of the train step on a constant batch (bench.py)
  data_fed      measured end-to-end images/sec

With the prefetch thread overlapping decode and device steps,
data_fed ≈ min(loader_only, step_only); the report states which side
bounds this host. (This dev box has ONE CPU core — the C++ pool scales
with cores on production hosts; see PERFORMANCE.md "Input pipeline".)

Run: python benchmarks/datafed_bench.py [--steps N] [--images N]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--images", type=int, default=1536)
    ap.add_argument("--batch-size", type=int, default=192)
    ap.add_argument("--image-size", type=int, default=480,
                    help="on-disk JPEG side (decode-realistic)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="arsvt_datafed_")
    try:
        _run(args, tmp)
    finally:  # failed runs must not leak hundreds of MB of JPEGs in /tmp
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def _run(args, tmp):
    from arsvt_tpu.data import native_loader
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import classification_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco
    from arsvt_tpu.train.config import TrainConfig
    from arsvt_tpu.train.train_step import make_classifier_step_fns

    log(f"native loader: {native_loader.available()}, "
        f"host cores: {os.cpu_count()}")
    t0 = time.time()
    make_synthetic_coco(tmp, splits=("train",),
                        images_per_split=args.images,
                        image_size=args.image_size, max_boxes=3, seed=0)
    log(f"wrote {args.images} {args.image_size}px JPEGs in "
        f"{time.time()-t0:.0f}s")
    ds = CocoDataset(os.path.join(tmp, "train"))

    # ---- loader-only rate (drain the pipeline, no device work) ----------
    batches = classification_batches(
        ds, batch_size=args.batch_size, canvas=256, seed=0
    )
    next(batches)  # warm the thread + page cache
    t0 = time.time()
    n_drain = 10
    for _ in range(n_drain):
        next(batches)
    loader_only = n_drain * args.batch_size / (time.time() - t0)
    # join: an in-flight 192-image decode would otherwise keep eating the
    # single host core into the step_only timing below
    batches.close(wait=True)
    log(f"loader_only: {loader_only:.1f} img/s")

    # ---- loader-only with DCT-scaled JPEG decode (the opt-in host knob:
    # ARSVT_SCALED_DECODE=1; on these noise-background synthetic JPEGs the
    # gain is entropy-decode-bound ~1.2x; photo-like inputs measure 1.7x,
    # benchmarks/loader_bench.py) ---------------------------------------
    os.environ["ARSVT_SCALED_DECODE"] = "1"
    try:
        batches = classification_batches(
            ds, batch_size=args.batch_size, canvas=256, seed=0
        )
        next(batches)
        t0 = time.time()
        for _ in range(n_drain):
            next(batches)
        loader_scaled = n_drain * args.batch_size / (time.time() - t0)
        batches.close(wait=True)
    finally:
        del os.environ["ARSVT_SCALED_DECODE"]
    log(f"loader_only (scaled decode): {loader_scaled:.1f} img/s")

    # ---- decode+letterbox ONLY (no pipeline machinery): localizes the
    # scaled-decode win and its Amdahl share. Standalone, the decode
    # stage measures ~1.7x from DCT scaling even on these noise JPEGs
    # (480->256: scale 5/8 skips most IDCT + color-convert + resize);
    # BENCH_r04's +1% loader_only delta (122.3 vs 121.1) therefore means
    # the loader path is bound by the per-batch pipeline work around the
    # decode (thread-pool handoff + batch assembly sharing the 1 host
    # core), not that the knob is broken. These two rows put the
    # stage-level speedup next to the pipeline-level one in the artifact.
    decode_only = decode_scaled = None
    if native_loader.available():
        paths = [r.path for r in ds.records][: args.batch_size]

        def time_decode(**kw):
            native_loader.load_letterboxed_batch(paths, 256, **kw)  # warm
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                native_loader.load_letterboxed_batch(paths, 256, **kw)
            return reps * len(paths) / (time.time() - t0)

        decode_only = time_decode(scaled_decode=False)
        decode_scaled = time_decode(scaled_decode=True)
        log(f"decode_only: {decode_only:.1f} img/s, "
            f"scaled: {decode_scaled:.1f} img/s "
            f"({decode_scaled / decode_only:.2f}x at the decode stage; "
            f"loader_only shows what survives the pipeline)")

    # ---- train step (champion bench config) -----------------------------
    cfg = TrainConfig(
        preset="vit_base_16_224", batch_size=args.batch_size, bf16=True,
        augment="crop_flip", canvas=256, total_steps=10**6,
    )
    init_fn, train_step, _ = make_classifier_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    const_batch = {
        "image": jnp.asarray(np.random.default_rng(0).integers(
            0, 255, size=(args.batch_size, 256, 256, 3), dtype=np.uint8)),
        "label": jnp.asarray(np.random.default_rng(1).integers(
            0, 6, size=(args.batch_size,)), jnp.int32),
    }
    t0 = time.time()
    state, m = train_step(state, const_batch, rng)
    float(m["loss"])
    log(f"compile+first step: {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(10):
        state, m = train_step(state, const_batch, rng)
    float(m["loss"])
    step_only = 10 * args.batch_size / (time.time() - t0)
    log(f"step_only: {step_only:.1f} img/s")

    # ---- data-fed end-to-end --------------------------------------------
    batches = classification_batches(
        ds, batch_size=args.batch_size, canvas=256, seed=1
    )
    state, m = train_step(state, next(batches), rng)  # warm
    float(m["loss"])
    # cpu and wall windows must cover the SAME section or the reported
    # utilization includes warm-step/prefetch CPU outside the wall window
    cpu0 = time.process_time()
    t0 = time.time()
    for _ in range(args.steps):
        state, m = train_step(state, next(batches), rng)
    float(m["loss"])
    wall = time.time() - t0
    host_cpu = time.process_time() - cpu0
    batches.close()
    data_fed = args.steps * args.batch_size / wall
    bound = "host decode" if loader_only < step_only else "chip"
    predicted = min(loader_only, step_only)
    result = {
        "loader_only_img_s": round(loader_only, 1),
        "loader_only_scaled_decode_img_s": round(loader_scaled, 1),
        # decode-stage-only rates on this bench's uniform-noise JPEGs —
        # the worst case for DCT-scaled decode (entropy decode can't be
        # skipped); see the section comment above
        "decode_only_img_s": (
            round(decode_only, 1) if decode_only else None
        ),
        "decode_only_scaled_img_s": (
            round(decode_scaled, 1) if decode_scaled else None
        ),
        "scaled_decode_note": (
            "decode stage alone gains ~1.7x from DCT scaling; a small "
            "loader_only delta means the pipeline work around the decode "
            "(thread handoff + batch assembly on 1 core) is the binding "
            "constraint, not the decode"
        ),
        "step_only_img_s": round(step_only, 1),
        "data_fed_img_s": round(data_fed, 1),
        "predicted_min_img_s": round(predicted, 1),
        "overlap_efficiency": round(data_fed / predicted, 3),
        "bound_by": bound,
        "host_cpu_utilization": round(host_cpu / wall, 3),
        "host_cores": os.cpu_count(),
        "steps": args.steps,
        "batch_size": args.batch_size,
        "jpeg_side_px": args.image_size,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
