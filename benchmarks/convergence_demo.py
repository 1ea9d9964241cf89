"""End-to-end convergence demo on the real chip (or CPU).

Trains (1) a ViT-Tiny-class classifier on the synthetic separable 6-class
set to high top-1, and (2) the test detector on synthetic COCO until the
detection loss drops — writing `convergence_demo.json`. This is the
"training actually learns" artifact complementing the unit/integration
tests (which only assert a few steps of loss decrease).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import itertools
import json
import sys
import tempfile

import jax

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arsvt_tpu.data.coco import CocoDataset
from arsvt_tpu.data.pipeline import detection_batches
from arsvt_tpu.data.synthetic import (
    make_synthetic_coco,
    synthetic_classification_batches,
)
from arsvt_tpu.train.config import TRAIN_PRESETS
from arsvt_tpu.train.trainer import Trainer
from arsvt_tpu.utils.logging import MetricLogger


def classifier_demo(steps=300):
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        preset="vit_test_8_32", batch_size=64, total_steps=steps,
        learning_rate=3e-4, warmup_steps=20, log_every=50,
        eval_every=10**9, checkpoint_every=10**9, bf16=True,
    )
    tr = Trainer(cfg, logger=MetricLogger(quiet=False))
    batches = synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0
    )
    tr.fit(batches)
    ev = tr.evaluate(itertools.islice(
        synthetic_classification_batches(
            batch_size=64, image_size=32, seed=777
        ), 8,
    ))
    print(f"classifier: top-1 {ev['accuracy']:.3f} loss {ev['loss']:.3f}",
          file=sys.stderr)
    return {"top1": ev["accuracy"], "loss": ev["loss"],
            "confusion": ev.get("confusion")}


def detector_demo(steps=200):
    import shutil

    root = make_synthetic_coco(
        tempfile.mkdtemp(), splits=("train",), images_per_split=64,
        image_size=64, max_boxes=3,
    )
    ds = CocoDataset(root + "/train")
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        preset="detector_test", task="detect", batch_size=32,
        total_steps=steps, learning_rate=3e-4, warmup_steps=20,
        log_every=50, eval_every=10**9, checkpoint_every=10**9,
        max_objects=4, bf16=True,
    )
    tr = Trainer(cfg, logger=MetricLogger(quiet=False))
    batches = detection_batches(
        ds, batch_size=32, canvas=32, max_objects=4, seed=0
    )
    tr.init_state()
    from arsvt_tpu.parallel.sharding import shard_batch

    first = next(batches)
    _, m0 = tr.train_step(tr.state, shard_batch(first, tr.mesh), tr.base_rng)
    first_loss = float(m0["loss"])
    tr.init_state()
    last = tr.fit(batches)
    print(f"detector: loss {first_loss:.3f} -> {last['loss']:.3f}",
          file=sys.stderr)
    shutil.rmtree(root, ignore_errors=True)
    return {"first_loss": first_loss, "final_loss": last["loss"],
            "final_loss_bbox": last.get("loss_bbox"),
            "final_loss_ce": last.get("loss_ce")}


if __name__ == "__main__":
    results = {
        "backend": jax.default_backend(),
        "classifier": classifier_demo(),
        "detector": detector_demo(),
    }
    with open("convergence_demo.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results)[:400])
