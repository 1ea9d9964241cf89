"""Detection generalization demo: val mAP > 0 (VERDICT round-1 next #4).

Round 1 proved the matcher→loss→head chain can *memorize* but committed no
artifact with nonzero val mAP. This run trains the mid-size
`detector_demo_96` on a synthetic COCO set (class-colored non-overlapping
rectangles on noise; DEMO_TRAIN_IMAGES train, default 4000 /
DEMO_VAL_IMAGES val, default 1024)
and evaluates the full post-process→NMS→COCO-AP chain on the held-out
split. DEMO_AUG=detection enables the reference-parity augmentation
pipeline — the committed artifact's headline (val mAP 0.64 / AP50 1.0) is
the 8000-image / 20000-step augmented run.
Batches are pre-decoded into memory (the 1-core dev host's JPEG decode
would otherwise starve the chip).

Writes `detection_generalization.json` at the repo root.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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

from arsvt_tpu.data.coco import CocoDataset
from arsvt_tpu.data.pipeline import load_letterboxed
from arsvt_tpu.data.synthetic import make_synthetic_coco
from arsvt_tpu.evaluation.detect import evaluate_detector
from arsvt_tpu.train.config import TrainConfig
from arsvt_tpu.train.detect_step import make_detector_step_fns

CANVAS = 96
BS = 64
STEPS = int(os.environ.get("DEMO_STEPS", "6000"))
TRAIN_IMAGES = int(os.environ.get("DEMO_TRAIN_IMAGES", "4000"))
MAX_OBJECTS = 8


def load_split(split_dir: str):
    ds = CocoDataset(split_dir)
    images, _ = load_letterboxed(
        [r.path for r in ds.records], CANVAS, records=ds.records,
        dtype=np.uint8,
    )
    targets = [ds.padded_target(i, MAX_OBJECTS) for i in range(len(ds))]
    return ds, images, {
        "boxes": np.stack([t["boxes"] for t in targets]),
        "labels": np.stack([t["labels"] for t in targets]),
        "mask": np.stack([t["mask"] for t in targets]),
    }


def main():
    import shutil

    tmp = tempfile.mkdtemp(prefix="arsvt_det_demo_")
    try:
        _run(tmp)
    finally:  # failed runs must not leak the JPEG tree in /tmp
        shutil.rmtree(tmp, ignore_errors=True)


def _run(tmp):
    make_synthetic_coco(tmp, splits=("train",), images_per_split=TRAIN_IMAGES,
                        image_size=96, max_boxes=3, seed=0)
    # >= 1000 val images (VERDICT round-3 #6): mAP on the old 80-image
    # split had confidence bounds wide enough to swallow the headline
    make_synthetic_coco(
        tmp, splits=("valid",),
        images_per_split=int(os.environ.get("DEMO_VAL_IMAGES", "1024")),
        image_size=96, max_boxes=3, seed=1,
    )
    _, tr_images, tr_t = load_split(os.path.join(tmp, "train"))
    _, va_images, va_t = load_split(os.path.join(tmp, "valid"))
    print(f"train {tr_images.shape} valid {va_images.shape}",
          file=sys.stderr, flush=True)

    # DEMO_AUG default "none" isolates the matcher→loss→NMS→AP chain;
    # "detection" (the headline artifact) adds the reference-parity pipeline
    # and measured strictly better generalization (0.26 → 0.58 val mAP at
    # the 4000-image scale). w_triplet=0: the reference's triplet loss acts on shared-backbone CLS
    # features with noisy "dominant class" image labels — useful for the
    # sorter's metric-learning surface, but on this multi-object synthetic
    # set it just perturbs the backbone. grad_clip 0.1 (DETR practice):
    # raw grad norms run 25-70 here, so the 1.0 default clips constantly
    # and down-scales every update.
    cfg = TrainConfig(
        preset="detector_demo_96", task="detect", num_classes=6,
        batch_size=BS, image_size=CANVAS, canvas=CANVAS,
        augment=os.environ.get("DEMO_AUG", "none"),
        learning_rate=float(os.environ.get("DEMO_LR", "3e-4")),
        weight_decay=1e-4,
        warmup_steps=min(500, STEPS // 10), total_steps=STEPS,
        schedule="cosine",
        bf16=True, max_objects=MAX_OBJECTS, aux_loss=True,
        w_triplet=0.0, grad_clip_norm=0.1,
        # DEMO_WARP: bilinear-warp variant for the A/B convergence gate
        # (taps = exact 4-gather, shear_matmul = approximate gather-free
        # MXU resampler). "" = module default.
        warp_variant=os.environ.get("DEMO_WARP", ""),
    )
    init_fn, train_step, eval_step = make_detector_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    base_rng = jax.random.PRNGKey(1)
    order_rng = np.random.default_rng(2)

    n = tr_images.shape[0]
    t0 = time.time()
    m = None
    for step in range(STEPS):
        idx = order_rng.integers(0, n, BS)
        batch = {
            "image": jnp.asarray(tr_images[idx]),
            "boxes": jnp.asarray(tr_t["boxes"][idx]),
            "labels": jnp.asarray(tr_t["labels"][idx]),
            "mask": jnp.asarray(tr_t["mask"][idx]),
        }
        state, m = train_step(state, batch, base_rng)
        if step == 0 or (step + 1) % 250 == 0:
            host = {k: round(float(v), 4) for k, v in m.items()}
            print(f"step {step+1}: {host}", file=sys.stderr, flush=True)
    train_secs = time.time() - t0

    def batches_of(images, t, limit=None):
        stop = images.shape[0] if limit is None else min(limit, images.shape[0])
        for s in range(0, stop, BS):
            yield {
                "image": jnp.asarray(images[s:s + BS]),
                "boxes": jnp.asarray(t["boxes"][s:s + BS]),
                "labels": jnp.asarray(t["labels"][s:s + BS]),
                "mask": jnp.asarray(t["mask"][s:s + BS]),
            }

    result = evaluate_detector(
        eval_step, state["params"], batches_of(va_images, va_t),
        num_classes=6, conf_threshold=0.5, nms_threshold=0.5,
    )
    # train-split AP through the same post-process->NMS->AP chain: separates
    # "eval-chain bug" (train AP ~0 despite near-perfect fit) from
    # "memorization" (train AP high, val AP low)
    train_result = evaluate_detector(
        eval_step, state["params"], batches_of(tr_images, tr_t, limit=128),
        num_classes=6, conf_threshold=0.5, nms_threshold=0.5,
    )
    artifact = {
        "config": {
            "preset": cfg.preset, "steps": STEPS, "batch_size": BS,
            "train_images": int(n), "val_images": int(va_images.shape[0]),
            "augment": cfg.augment, "aux_loss": cfg.aux_loss,
            "warp_variant": cfg.warp_variant or "default",
        },
        "final_train_metrics": {
            k: round(float(v), 4) for k, v in m.items()
        },
        "train_seconds": round(train_secs, 1),
        "val": dict(result),
        "train_split": {k: v for k, v in train_result.items()
                        if k in ("mAP", "AP50", "AP75")},
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("DEMO_OUT", "detection_generalization.json"),
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"val_mAP": result["mAP"], "val_AP50": result["AP50"],
                      "train_mAP": train_result["mAP"], "artifact": out}))


if __name__ == "__main__":
    main()
