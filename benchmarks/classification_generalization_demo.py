"""Classification generalization demo (VERDICT round-2 #4).

The north-star metric surface (BASELINE.json: 6-class top-1 + confusion
matrix) gets a NON-TRIVIAL held-out artifact: the synthetic set is
non-color-separable by construction — class = shape/texture (disk /
rectangle / triangle / ring / cross / striped-disk) with fg/bg colors drawn
identically for every class, so a linear probe on color statistics scores
chance (pinned by tests/test_data.py::test_synthetic_shapes_not_color_
separable). A `vit_demo_8_96` classifier trains with the crop_flip pipeline
and is evaluated on a held-out split drawn from a disjoint seed.

Writes `classification_generalization.json` at the repo root.
Reference gap being filled: /root/reference/evaluation.py:593-615 prints
prediction counts only — no accuracy surface exists there at all.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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

from arsvt_tpu.data.synthetic import synthetic_shape_image
from arsvt_tpu.evaluation.classify import evaluate_classifier
from arsvt_tpu.train.config import TrainConfig
from arsvt_tpu.train.train_step import make_classifier_step_fns

SIZE = 96          # model input
CANVAS = 112       # generator canvas; crop_flip crops SIZE out of it
BS = 256
STEPS = int(os.environ.get("DEMO_STEPS", "4000"))
GRAD_ACCUM = int(os.environ.get("DEMO_GRAD_ACCUM", "1"))
TRAIN_IMAGES = int(os.environ.get("DEMO_TRAIN_IMAGES", "16384"))
VAL_IMAGES = 2048


def make_pool(n: int, seed: int):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 6, size=(n,)).astype(np.int32)
    imgs = np.empty((n, CANVAS, CANVAS, 3), np.uint8)
    for i, lab in enumerate(labels):
        imgs[i] = (synthetic_shape_image(int(lab), CANVAS, rng)
                   * 255).astype(np.uint8)
    return imgs, labels


def main():
    t0 = time.time()
    cache = os.environ.get("DEMO_POOL_CACHE", "")
    if cache and os.path.exists(cache):
        z = np.load(cache)
        tr_images, tr_labels = z["tr_images"], z["tr_labels"]
        va_images, va_labels = z["va_images"], z["va_labels"]
        # a stale/mismatched cache must fail loudly, not silently change
        # the artifact's documented data contract
        assert tr_images.shape == (TRAIN_IMAGES, CANVAS, CANVAS, 3)
        assert tr_labels.shape == (TRAIN_IMAGES,)
        assert va_images.shape == (VAL_IMAGES, CANVAS, CANVAS, 3)
        assert va_labels.shape == (VAL_IMAGES,)
    else:
        tr_images, tr_labels = make_pool(TRAIN_IMAGES, seed=0)
        va_images, va_labels = make_pool(VAL_IMAGES, seed=10_000)
        if cache:  # write on miss so the env var actually caches
            np.savez_compressed(
                cache, tr_images=tr_images, tr_labels=tr_labels,
                va_images=va_images, va_labels=va_labels,
            )
    print(f"pools built in {time.time()-t0:.0f}s: train {tr_images.shape} "
          f"val {va_images.shape}", file=sys.stderr, flush=True)

    cfg = TrainConfig(
        preset="vit_demo_8_96", num_classes=6,
        batch_size=BS, image_size=SIZE, canvas=CANVAS,
        augment="crop_flip",
        learning_rate=float(os.environ.get("DEMO_LR", "3e-4")),
        weight_decay=0.05,
        warmup_steps=min(400, STEPS // 10), total_steps=STEPS,
        schedule="cosine", bf16=True, grad_accum=GRAD_ACCUM,
    )
    init_fn, train_step, eval_step = make_classifier_step_fns(cfg, mesh=None)
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
            "label": jnp.asarray(tr_labels[idx]),
        }
        state, m = train_step(state, batch, base_rng)
        if step == 0 or (step + 1) % 250 == 0:
            host = {k: round(float(v), 4) for k, v in m.items()}
            print(f"step {step+1}: {host}", file=sys.stderr, flush=True)
    train_secs = time.time() - t0

    def batches_of(images, labels):
        for s in range(0, images.shape[0], BS):
            yield {
                "image": jnp.asarray(images[s:s + BS]),
                "label": jnp.asarray(labels[s:s + BS]),
            }

    from arsvt_tpu.train.config import resolve_backbone

    bb = resolve_backbone(cfg)  # honors cfg.image_size like training did
    result = evaluate_classifier(
        state["params"], batches_of(va_images, va_labels), bb, 6,
        normalize_inputs=True,  # crop_flip training normalizes in-step
    )
    train_result = evaluate_classifier(
        state["params"],
        batches_of(tr_images[:VAL_IMAGES], tr_labels[:VAL_IMAGES]), bb, 6,
        normalize_inputs=True,
    )
    artifact = {
        "config": {
            "preset": cfg.preset, "steps": STEPS, "batch_size": BS,
            "grad_accum": GRAD_ACCUM,
            "train_images": int(n), "val_images": int(va_images.shape[0]),
            "augment": cfg.augment,
            "dataset": "non-color-separable shapes "
                       "(disk/rect/triangle/ring/cross/striped-disk, "
                       "class-independent colors)",
        },
        "final_train_metrics": {k: round(float(v), 4) for k, v in m.items()},
        "train_seconds": round(train_secs, 1),
        "val": result,
        "train_split_top1": train_result["top1"],
    }
    name = ("classification_generalization.json" if GRAD_ACCUM == 1
            else "classification_generalization_accum.json")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), name)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"val_top1": result["top1"],
                      "train_top1": train_result["top1"],
                      "artifact": out}))


if __name__ == "__main__":
    main()
