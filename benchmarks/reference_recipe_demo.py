"""Reference-recipe convergence: the faithful training configuration
end-to-end through the real Trainer.

The other demos tune their own optimizer recipes; this one runs the
`deit_detector_ref` TRAIN_PRESET *as the reference trains*
(/root/reference/train.py:1345-1392): DeiT 400d/12L/25H/1600mlp backbone,
5 learned queries, batch 32, AdamW lr 1e-4 / wd 1e-4, dropout 0.1
INCLUDING attention probabilities (in-kernel on TPU), the full
shadow/flip/affine/jitter/dropout augmentation pipeline, triplet weight
0.6, and ReduceLROnPlateau(factor .7, patience 1) stepped on val loss at
an epoch-equivalent cadence — driven by `Trainer.fit`, so the run also
exercises the val-mAP eval cadence, plateau state, and checkpointing
exactly as a user would.

Data is synthetic COCO (non-overlapping class-colored rectangles, ≤3
objects — within the preset's 5 queries) pre-decoded into memory so the
1-core dev host does not starve the chip.

Writes `reference_recipe_convergence.json` at the repo root.
Env: DEMO_STEPS (default 25000), DEMO_TRAIN_IMAGES (8000), DEMO_EVAL_EVERY
(default one epoch = train_images/batch).
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
from arsvt_tpu.train.config import TRAIN_PRESETS
from arsvt_tpu.train.detect_step import make_detector_step_fns
from arsvt_tpu.train.trainer import Trainer

CANVAS = 224
STEPS = int(os.environ.get("DEMO_STEPS", "25000"))
TRAIN_IMAGES = int(os.environ.get("DEMO_TRAIN_IMAGES", "8000"))
VAL_IMAGES = 256
MAX_OBJECTS = 25  # preset parity (the reference pads to max_objects=25)


def load_split(split_dir: str):
    ds = CocoDataset(split_dir)
    images, _ = load_letterboxed(
        [r.path for r in ds.records], CANVAS, records=ds.records,
        dtype=np.uint8,
    )
    targets = [ds.padded_target(i, MAX_OBJECTS) for i in range(len(ds))]
    return images, {
        "boxes": np.stack([t["boxes"] for t in targets]),
        "labels": np.stack([t["labels"] for t in targets]),
        "mask": np.stack([t["mask"] for t in targets]),
    }


def main():
    import shutil

    tmp = tempfile.mkdtemp(prefix="arsvt_ref_recipe_")
    make_synthetic_coco(tmp, splits=("train",), images_per_split=TRAIN_IMAGES,
                        image_size=CANVAS, max_boxes=3, seed=0)
    make_synthetic_coco(tmp, splits=("valid",), images_per_split=VAL_IMAGES,
                        image_size=CANVAS, max_boxes=3, seed=1)
    tr_images, tr_t = load_split(os.path.join(tmp, "train"))
    va_images, va_t = load_split(os.path.join(tmp, "valid"))
    shutil.rmtree(tmp, ignore_errors=True)
    print(f"train {tr_images.shape} valid {va_images.shape}",
          file=sys.stderr, flush=True)

    epoch = max(1, TRAIN_IMAGES // 32)
    cfg = TRAIN_PRESETS["deit_detector_ref"].with_overrides(
        total_steps=STEPS,
        # the reference steps ReduceLROnPlateau once per epoch on val loss
        # (train.py:1627-1631); eval_every mirrors that cadence
        eval_every=int(os.environ.get("DEMO_EVAL_EVERY", str(epoch))),
        log_every=250,
        checkpoint_every=10 * epoch,
        checkpoint_dir=os.path.join(tempfile.gettempdir(), "ref_recipe_ck"),
        max_objects=MAX_OBJECTS,
    )
    trainer = Trainer(cfg)

    order_rng = np.random.default_rng(2)
    n = tr_images.shape[0]

    def train_batches():
        while True:
            idx = order_rng.integers(0, n, cfg.batch_size)
            yield {
                "image": jnp.asarray(tr_images[idx]),
                "boxes": jnp.asarray(tr_t["boxes"][idx]),
                "labels": jnp.asarray(tr_t["labels"][idx]),
                "mask": jnp.asarray(tr_t["mask"][idx]),
            }

    def batches_of(images, t, limit=None):
        stop = images.shape[0] if limit is None else min(limit,
                                                         images.shape[0])
        for s in range(0, stop, cfg.batch_size):
            yield {
                "image": jnp.asarray(images[s:s + cfg.batch_size]),
                "boxes": jnp.asarray(t["boxes"][s:s + cfg.batch_size]),
                "labels": jnp.asarray(t["labels"][s:s + cfg.batch_size]),
                "mask": jnp.asarray(t["mask"][s:s + cfg.batch_size]),
            }

    t0 = time.time()
    last = trainer.fit(
        train_batches(),
        eval_batches_fn=lambda: batches_of(va_images, va_t),
    )
    train_secs = time.time() - t0

    # offline COCO-protocol AP through the evaluation engine (the trainer's
    # cadence already logged val/mAP; this is the committed headline)
    _, _, eval_step = make_detector_step_fns(cfg, mesh=None)
    result = evaluate_detector(
        eval_step, trainer.state["params"], batches_of(va_images, va_t),
        num_classes=6, conf_threshold=0.5, nms_threshold=0.5,
    )
    train_result = evaluate_detector(
        eval_step, trainer.state["params"],
        batches_of(tr_images, tr_t, limit=256),
        num_classes=6, conf_threshold=0.5, nms_threshold=0.5,
    )
    import dataclasses

    artifact = {
        "recipe": "deit_detector_ref preset, faithful reference "
                  "hyperparameters (train.py:1345-1392): DeiT-400d, 5 "
                  "queries, bs32, AdamW 1e-4/wd 1e-4, dropout 0.1 incl. "
                  "attention probs (in-kernel), plateau on val loss, "
                  "full augmentation, triplet 0.6",
        "config": {"steps": STEPS, "train_images": TRAIN_IMAGES,
                   "val_images": VAL_IMAGES, "epoch_steps": epoch},
        "final_train_metrics": {
            k: round(float(v), 4) for k, v in (last or {}).items()
        },
        "plateau_state": dataclasses.asdict(trainer.plateau),
        "train_seconds": round(train_secs, 1),
        "val": {k: v for k, v in result.items()},
        "train_split": {k: v for k, v in train_result.items()
                        if k in ("mAP", "AP50", "AP75")},
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reference_recipe_convergence.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"val_mAP": result["mAP"], "val_AP50": result["AP50"],
                      "train_mAP": train_result["mAP"],
                      "plateau_scale": trainer.plateau.scale,
                      "artifact": out}))


if __name__ == "__main__":
    main()
