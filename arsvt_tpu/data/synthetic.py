"""Synthetic datasets for tests, smoke training and benchmarks.

SURVEY.md §4 integration strategy: a generated 6-class image set with a
learnable class signal, and a tiny generated COCO-format detection directory
(images + `_annotations.coco.json`) matching the reference's on-disk layout
(/root/reference/train.py:1386-1389: `<root>/{train,valid,test}/` each with
`_annotations.coco.json`).
"""

from __future__ import annotations

import json
import os

import numpy as np

from arsvt_tpu.data.taxonomy import NUM_CLASSES, RECYCLING_CLASSES

# distinct mean colors per class — a signal tiny ViTs can learn in tens of
# steps, with additive noise so it is not linearly trivial
_CLASS_COLORS = np.array(
    [
        [0.2, 0.8, 0.8],  # glass
        [0.9, 0.9, 0.85],  # paper
        [0.7, 0.5, 0.2],  # cardboard
        [0.9, 0.3, 0.3],  # plastic
        [0.6, 0.6, 0.7],  # metal
        [0.25, 0.25, 0.2],  # trash
    ],
    dtype=np.float32,
)


def synthetic_classification_batches(
    *, batch_size: int, image_size: int, seed: int = 0, noise: float = 0.25,
    num_classes: int = NUM_CLASSES,
):
    """Infinite generator of {"image": (B,S,S,3) f32, "label": (B,) i32}."""
    rng = np.random.default_rng(seed)
    while True:
        labels = rng.integers(0, num_classes, size=(batch_size,))
        base = _CLASS_COLORS[labels % len(_CLASS_COLORS)]
        imgs = np.broadcast_to(
            base[:, None, None, :], (batch_size, image_size, image_size, 3)
        ).copy()
        imgs += noise * rng.standard_normal(imgs.shape).astype(np.float32)
        # textured square patch whose position also correlates with class
        for i, lab in enumerate(labels):
            s = image_size // 4
            off = (int(lab) * s) % max(image_size - s, 1)
            imgs[i, off : off + s, off : off + s] += 0.5
        yield {
            "image": imgs.astype(np.float32),
            "label": labels.astype(np.int32),
        }


def make_synthetic_coco(
    root: str, *, splits=("train", "valid", "test"), images_per_split: int = 8,
    image_size: int = 64, max_boxes: int = 3, seed: int = 0,
) -> str:
    """Write a tiny COCO-format detection dataset; returns `root`."""
    rng = np.random.default_rng(seed)
    from PIL import Image

    for split in splits:
        split_dir = os.path.join(root, split)
        os.makedirs(split_dir, exist_ok=True)
        images, annotations = [], []
        ann_id = 1
        for img_id in range(1, images_per_split + 1):
            fname = f"img_{img_id:04d}.jpg"
            img = rng.uniform(0.3, 0.7, (image_size, image_size, 3))
            n_boxes = int(rng.integers(0, max_boxes + 1))
            placed: list[tuple[float, float, float, float]] = []
            for _ in range(n_boxes):
                cat = int(rng.integers(0, NUM_CLASSES))
                # rejection-sample a non-overlapping placement: a later box
                # painted over an earlier one leaves the earlier annotation
                # with no visible evidence — unlearnable GT that teaches the
                # model to hallucinate (measured: occluded-GT datasets train
                # to high train-AP but near-zero val-AP)
                for _attempt in range(20):
                    w = float(rng.uniform(8, image_size // 2))
                    h = float(rng.uniform(8, image_size // 2))
                    x = float(rng.uniform(0, image_size - w))
                    y = float(rng.uniform(0, image_size - h))
                    if all(
                        x >= px + pw or px >= x + w or y >= py + ph
                        or py >= y + h
                        for (px, py, pw, ph) in placed
                    ):
                        break
                else:
                    continue  # no free spot found — drop this box
                placed.append((x, y, w, h))
                img[int(y) : int(y + h), int(x) : int(x + w)] = _CLASS_COLORS[cat]
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        # COCO bbox format: [x, y, w, h] in pixels
                        "bbox": [x, y, w, h],
                        "category_id": cat + 1,  # COCO ids are 1-based
                        "area": w * h,
                        "iscrowd": 0,
                    }
                )
                ann_id += 1
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(split_dir, fname), quality=95
            )
            images.append(
                {
                    "id": img_id,
                    "file_name": fname,
                    "width": image_size,
                    "height": image_size,
                }
            )
        coco = {
            "images": images,
            "annotations": annotations,
            "categories": [
                {"id": i + 1, "name": name, "supercategory": "waste"}
                for i, name in enumerate(RECYCLING_CLASSES)
            ],
        }
        with open(os.path.join(split_dir, "_annotations.coco.json"), "w") as f:
            json.dump(coco, f)
    return root
