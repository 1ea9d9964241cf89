"""CLI end-to-end smoke: train via the CLI, then evaluate the checkpoint
via the eval CLI (with visualizations) — both as in-process calls."""

import json
import os

import pytest

from arsvt_tpu.data.synthetic import make_synthetic_coco


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_synthetic_coco(
        str(tmp_path_factory.mktemp("clicoco")), images_per_split=24,
        image_size=32, max_boxes=2,
    )


def test_train_then_eval_cli_detection(coco_root, tmp_path, monkeypatch):
    from arsvt_tpu.evaluation import cli as eval_cli
    from arsvt_tpu.train import cli as train_cli

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt")
    last = train_cli.main([
        "--train-preset", "smoke",
        "--preset", "detector_test", "--task", "detect",
        "--data-dir", coco_root, "--batch-size", "8",
        "--total-steps", "4", "--checkpoint-every", "4",
        "--log-every", "2", "--canvas", "32", "--max-objects", "4",
        "--checkpoint-dir", ckpt_dir, "--bf16", "false",
    ])
    assert "loss" in last

    results = eval_cli.main([
        "--checkpoint-dir", ckpt_dir, "--data-dir", coco_root,
        "--split", "valid", "--batch-size", "8",
        "--conf-threshold", "0.05", "--visualize", "2",
        "--out", str(tmp_path / "res.json"),
    ])
    assert "mAP" in results
    saved = json.load(open(tmp_path / "res.json"))
    assert saved["split"] == "valid"
    viz = os.listdir(tmp_path / "eval_visualizations")
    assert len(viz) >= 1


def test_train_then_eval_cli_classification(coco_root, tmp_path, monkeypatch):
    from arsvt_tpu.evaluation import cli as eval_cli
    from arsvt_tpu.train import cli as train_cli

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt_cls")
    train_cli.main([
        "--train-preset", "smoke", "--data-dir", coco_root,
        "--batch-size", "8", "--total-steps", "4",
        "--checkpoint-every", "4", "--log-every", "2", "--canvas", "32",
        "--image-size", "32", "--augment", "crop_flip",
        "--checkpoint-dir", ckpt_dir, "--bf16", "false",
    ])
    results = eval_cli.main([
        "--checkpoint-dir", ckpt_dir, "--data-dir", coco_root,
        "--split", "valid", "--batch-size", "8",
        "--out", str(tmp_path / "res_cls.json"),
    ])
    assert "accuracy" in results and "confusion" in results


def test_train_then_eval_cli_folder_dataset(tmp_path, monkeypatch):
    """The TrashNet folder-per-class layout drives BOTH CLIs end-to-end:
    an unsplit root (class dirs of JPEGs, no COCO JSON) trains via the
    stable hash split and evaluates with --split valid."""
    import numpy as np
    from PIL import Image

    from arsvt_tpu.data.taxonomy import RECYCLING_CLASSES
    from arsvt_tpu.evaluation import cli as eval_cli
    from arsvt_tpu.train import cli as train_cli

    root = tmp_path / "trashnet"
    rng = np.random.default_rng(0)
    for cls in RECYCLING_CLASSES:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), np.uint8)
            ).save(str(d / f"{cls}{i}.jpg"), quality=90)

    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "ckpt_folder")
    train_cli.main([
        "--train-preset", "smoke", "--data-dir", str(root),
        "--batch-size", "8", "--total-steps", "3",
        "--checkpoint-every", "3", "--log-every", "2", "--canvas", "32",
        "--image-size", "32", "--augment", "crop_flip",
        "--checkpoint-dir", ckpt_dir, "--bf16", "false",
    ])
    results = eval_cli.main([
        "--checkpoint-dir", ckpt_dir, "--data-dir", str(root),
        "--split", "valid", "--batch-size", "8",
        "--out", str(tmp_path / "res_folder.json"),
    ])
    assert "accuracy" in results and "confusion" in results


def test_cli_rejects_unknown_preset():
    from arsvt_tpu.train import cli

    with pytest.raises(SystemExit, match="unknown --train-preset"):
        cli.main(["--train-preset", "deit_detector_reff"])


def test_cli_rejects_class_count_mismatch(tmp_path):
    """A 7-category dataset against num_classes=6 must error, not silently
    zero out the 7th class's CE gradient."""
    import json as _json

    from PIL import Image

    from arsvt_tpu.train import cli

    for split in ("train", "valid"):
        d = tmp_path / "seven" / split
        d.mkdir(parents=True)
        coco = {
            "images": [{"id": 1, "file_name": "x.jpg", "width": 8,
                        "height": 8}],
            "annotations": [{"id": 1, "image_id": 1, "bbox": [1, 1, 4, 4],
                             "category_id": 7, "area": 16, "iscrowd": 0}],
            "categories": [{"id": i + 1, "name": f"c{i}",
                            "supercategory": "x"} for i in range(7)],
        }
        (d / "_annotations.coco.json").write_text(_json.dumps(coco))
        Image.new("RGB", (8, 8)).save(d / "x.jpg")
    with pytest.raises(SystemExit, match="7 classes"):
        cli.main(["--preset", "vit_test_8_32",
                  "--data-dir", str(tmp_path / "seven"), "--steps", "1"])


def test_input_canvas_rule():
    """ONE copy of the letterbox-size rule (train CLI, eval CLI and the
    visualizer all derive from it)."""
    from arsvt_tpu.train.config import TRAIN_PRESETS, input_canvas

    smoke = TRAIN_PRESETS["smoke"]
    # augmented: the (larger) augmentation canvas
    assert input_canvas(smoke.with_overrides(augment="crop_flip",
                                             canvas=96)) == 96
    # augment=none: the model's native size
    assert input_canvas(smoke.with_overrides(augment="none")) == 32
    # explicit image_size override wins
    assert input_canvas(smoke.with_overrides(augment="none",
                                             image_size=64)) == 64
    det = smoke.with_overrides(preset="detector_test", task="detect",
                               augment="none")
    from arsvt_tpu.train.config import resolve_detector
    assert input_canvas(det) == resolve_detector(det).backbone.image_size
