"""FolderDataset (TrashNet layout) — taxonomy mapping, stable split,
pipeline compatibility, and CLI auto-detection."""

import os

import numpy as np
import pytest

from arsvt_tpu.data.folder import (
    FolderDataset,
    open_classification_split,
)
from arsvt_tpu.data.taxonomy import RECYCLING_CLASSES


@pytest.fixture(scope="module")
def trashnet_root(tmp_path_factory):
    """Unsplit TrashNet layout: root/<class>/*.jpg, 8 images per class."""
    from PIL import Image

    root = tmp_path_factory.mktemp("trashnet")
    rng = np.random.default_rng(0)
    for cls in RECYCLING_CLASSES:
        d = root / cls
        d.mkdir()
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), np.uint8)
            ).save(str(d / f"{cls}{i}.jpg"), quality=90)
    return str(root)


def test_taxonomy_order_and_labels(trashnet_root):
    ds = FolderDataset(trashnet_root)
    assert ds.class_names == list(RECYCLING_CLASSES)
    assert ds.num_classes == 6
    assert len(ds) == 48
    labels = ds.classification_labels()
    # every record's label matches its directory's taxonomy index
    for r, lab in zip(ds.records, labels):
        assert RECYCLING_CLASSES[lab] in r.path


def test_stable_split_partitions(trashnet_root):
    train = FolderDataset(trashnet_root, split="train", val_fraction=0.25)
    valid = FolderDataset(trashnet_root, split="valid", val_fraction=0.25)
    tp = {r.path for r in train.records}
    vp = {r.path for r in valid.records}
    assert tp.isdisjoint(vp)
    assert len(tp) + len(vp) == 48
    assert 0 < len(vp) < 48
    # deterministic: a re-instantiation yields the identical split
    again = FolderDataset(trashnet_root, split="valid", val_fraction=0.25)
    assert {r.path for r in again.records} == vp


def test_classification_batches_accepts_folder_dataset(trashnet_root):
    from arsvt_tpu.data.pipeline import classification_batches

    ds = FolderDataset(trashnet_root)
    it = classification_batches(
        ds, batch_size=4, canvas=32, seed=0, repeat=False,
        drop_remainder=False,
    )
    b = next(it)
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["label"].shape == (4,)
    assert b["label"].dtype == np.int32


def test_open_classification_split_autodetect(tmp_path, trashnet_root):
    # unsplit layout: splits derived by hash
    tr = open_classification_split(trashnet_root, "train")
    va = open_classification_split(trashnet_root, "valid")
    assert isinstance(tr, FolderDataset) and isinstance(va, FolderDataset)
    assert {r.path for r in tr.records}.isdisjoint(
        {r.path for r in va.records}
    )
    with pytest.raises(ValueError, match="split valid"):
        open_classification_split(trashnet_root, "test")

    # pre-split folder layout: root/train/<class>/...
    from PIL import Image

    pre = tmp_path / "pre"
    for split in ("train", "valid"):
        for cls in ("glass", "paper"):
            d = pre / split / cls
            d.mkdir(parents=True)
            Image.fromarray(
                np.zeros((20, 20, 3), np.uint8)
            ).save(str(d / "a.jpg"))
    ds = open_classification_split(str(pre), "train")
    assert isinstance(ds, FolderDataset) and len(ds) == 2

    # COCO layout wins when annotations exist
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.synthetic import make_synthetic_coco

    root = make_synthetic_coco(
        str(tmp_path / "coco"), images_per_split=2, image_size=32
    )
    ds = open_classification_split(root, "train")
    assert isinstance(ds, CocoDataset)
