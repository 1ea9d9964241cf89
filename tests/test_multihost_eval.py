"""Multi-host eval via padded equal shards (VERDICT round-3 #5).

The reference is single-GPU (SURVEY.md §2 parallelism table); this suite
pins the rebuild's pod-scale eval story: every host yields the SAME number
of eval batches (padding the stride-shard tail with valid=0 rows), pad
rows drop out of every metric, and the plateau schedule — the reference's
actual schedule (train.py:1363-1367) — trains under a REAL 2-process
jax.distributed runtime on CPU.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.data.coco import CocoDataset
from arsvt_tpu.data.pipeline import (
    classification_batches,
    detection_batches,
)
from arsvt_tpu.data.synthetic import make_synthetic_coco

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mhcoco"))
    make_synthetic_coco(root, splits=("train",), images_per_split=16,
                        image_size=32, max_boxes=3, seed=0)
    # 9 val images: stride shards of 5 and 4 -> unequal RAW batch counts
    # at batch_size 4 (2 vs 1), the exact deadlock shape padding fixes
    make_synthetic_coco(root, splits=("valid",), images_per_split=9,
                        image_size=32, max_boxes=3, seed=1)
    return root


def test_pad_mode_needs_finite_unpadded_stream(coco_root):
    ds = CocoDataset(f"{coco_root}/valid")
    for bad in (dict(repeat=True, drop_remainder=False),
                dict(repeat=False, drop_remainder=True)):
        with pytest.raises(ValueError, match="pad_to_equal_batches"):
            classification_batches(
                ds, batch_size=4, canvas=32, pad_to_equal_batches=True,
                shuffle=False, **bad,
            )


def _drain(it):
    out = list(it)
    return out


def test_classification_padded_shards_equal_counts_full_coverage(coco_root):
    ds = CocoDataset(f"{coco_root}/valid")
    labels_all = ds.classification_labels()
    usable = int(np.sum(labels_all >= 0))
    per_host = []
    for pidx in range(2):
        per_host.append(_drain(classification_batches(
            ds, batch_size=4, canvas=32, shuffle=False, repeat=False,
            drop_remainder=False, pad_to_equal_batches=True,
            process_index=pidx, process_count=2,
        )))
    # equal batch counts, every batch exactly batch_size with a valid mask
    assert len(per_host[0]) == len(per_host[1]) > 0
    for batches in per_host:
        for b in batches:
            assert b["image"].shape[0] == 4
            assert b["label"].shape == (4,)
            assert b["valid"].shape == (4,)
            assert set(np.unique(b["valid"])) <= {0.0, 1.0}
            # pad rows are zero images with label 0
            for i in np.nonzero(b["valid"] == 0.0)[0]:
                assert not b["image"][i].any()
    # union of valid rows covers every usable record exactly once
    n_valid = sum(
        int(b["valid"].sum()) for bs in per_host for b in bs
    )
    assert n_valid == usable
    got = sorted(
        int(lbl)
        for bs in per_host for b in bs
        for lbl, v in zip(b["label"], b["valid"]) if v
    )
    want = sorted(int(x) for x in labels_all[labels_all >= 0])
    assert got == want


def test_detection_padded_shards_pad_rows_are_empty(coco_root):
    ds = CocoDataset(f"{coco_root}/valid")
    counts = []
    total_valid = 0
    for pidx in range(2):
        batches = _drain(detection_batches(
            ds, batch_size=4, canvas=32, max_objects=4, shuffle=False,
            repeat=False, drop_remainder=False, pad_to_equal_batches=True,
            process_index=pidx, process_count=2,
        ))
        counts.append(len(batches))
        for b in batches:
            assert b["image"].shape[0] == 4
            total_valid += int(b["valid"].sum())
            pad_rows = np.nonzero(b["valid"] == 0.0)[0]
            for i in pad_rows:
                assert not b["mask"][i].any()
                assert b["image_id"][i] == -1
                assert not b["image"][i].any()
    assert counts[0] == counts[1] > 0
    assert total_valid == len(ds)


def test_classifier_eval_step_masks_pad_rows():
    from arsvt_tpu.train.config import TrainConfig
    from arsvt_tpu.train.train_step import make_classifier_step_fns

    cfg = TrainConfig(preset="vit_test_8_32", batch_size=8, bf16=False,
                      augment="none", total_steps=10)
    init_fn, _, eval_step = make_classifier_step_fns(cfg, mesh=None)
    params = init_fn(jax.random.PRNGKey(0))["params"]
    rng = np.random.default_rng(0)
    real = {
        "image": rng.uniform(size=(6, 32, 32, 3)).astype(np.float32),
        "label": rng.integers(0, 6, size=(6,)).astype(np.int32),
    }
    # pad rows carry deliberately misleading content: nonzero garbage
    # images and labels — the mask alone must exclude them
    padded = {
        "image": np.concatenate(
            [real["image"],
             rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)]
        ),
        "label": np.concatenate(
            [real["label"], np.array([3, 3], np.int32)]
        ),
        "valid": np.array([1, 1, 1, 1, 1, 1, 0, 0], np.float32),
    }
    m_real = {k: np.asarray(v) for k, v in eval_step(params, real).items()}
    m_pad = {k: np.asarray(v) for k, v in eval_step(params, padded).items()}
    assert int(m_pad["count"]) == 6
    assert int(m_pad["correct"]) == int(m_real["correct"])
    np.testing.assert_allclose(m_pad["loss"], m_real["loss"], rtol=1e-5)
    np.testing.assert_array_equal(m_pad["confusion"], m_real["confusion"])


def _random_detection_case(b, q, m, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, q, 7)).astype(np.float32)
    pred = rng.uniform(0.2, 0.4, size=(b, q, 4)).astype(np.float32)
    lo = rng.uniform(0.0, 0.4, size=(b, m, 2)).astype(np.float32)
    hi = lo + rng.uniform(0.1, 0.4, size=(b, m, 2)).astype(np.float32)
    boxes = np.concatenate([lo, hi], axis=-1)
    labels = rng.integers(0, 6, size=(b, m)).astype(np.int32)
    mask = np.arange(m)[None, :] < rng.integers(1, m + 1, size=(b, 1))
    return logits, pred, boxes, labels, mask


def test_detection_loss_image_weight_drops_pad_rows():
    from arsvt_tpu.objectives.detection_loss import (
        DetectionLossConfig,
        detection_loss,
    )

    logits, pred, boxes, labels, mask = _random_detection_case(6, 5, 4, 7)
    # rows 4-5 are pad: empty targets, weight 0 (outputs left as garbage)
    mask[4:] = False
    weight = np.array([1, 1, 1, 1, 0, 0], np.float32)
    cfg = DetectionLossConfig()
    total_w, parts_w = detection_loss(
        {"class_logits": jnp.asarray(logits),
         "boxes_cxcywh": jnp.asarray(pred)},
        {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
         "mask": jnp.asarray(mask)},
        cfg, image_weight=jnp.asarray(weight),
    )
    total_r, parts_r = detection_loss(
        {"class_logits": jnp.asarray(logits[:4]),
         "boxes_cxcywh": jnp.asarray(pred[:4])},
        {"boxes": jnp.asarray(boxes[:4]), "labels": jnp.asarray(labels[:4]),
         "mask": jnp.asarray(mask[:4])},
        cfg,
    )
    np.testing.assert_allclose(float(total_w), float(total_r), rtol=1e-5)
    for k in parts_r:
        np.testing.assert_allclose(
            float(parts_w[k]), float(parts_r[k]), rtol=1e-5, err_msg=k
        )


def test_collect_batch_detections_skips_pad_rows():
    from arsvt_tpu.evaluation.detect import collect_batch_detections

    logits, pred, boxes, labels, mask = _random_detection_case(4, 5, 3, 11)
    batch = {
        "boxes": boxes, "labels": labels, "mask": mask,
        "valid": np.array([1, 1, 0, 0], np.float32),
    }
    outputs = {"class_logits": jnp.asarray(logits),
               "boxes_cxcywh": jnp.asarray(pred)}
    p, ap_p, g = collect_batch_detections(
        outputs, batch, conf_threshold=0.0, nms_threshold=0.9,
        ap_conf_threshold=0.0,
    )
    assert len(p) == len(ap_p) == len(g) == 2


def test_trainer_evaluate_padded_equals_unpadded(coco_root):
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.trainer import Trainer

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        data_dir=coco_root, batch_size=4, augment="none", image_size=32,
    )
    trainer = Trainer(cfg)
    trainer.init_state()
    ds = CocoDataset(f"{coco_root}/valid")

    def stream(padded):
        return classification_batches(
            ds, batch_size=4, canvas=32, shuffle=False, repeat=False,
            drop_remainder=False, pad_to_equal_batches=padded,
        )

    m_pad = trainer.evaluate(stream(True))
    m_raw = trainer.evaluate(stream(False))
    assert m_pad["accuracy"] == m_raw["accuracy"]
    np.testing.assert_allclose(m_pad["loss"], m_raw["loss"], rtol=1e-5)
    np.testing.assert_array_equal(m_pad["confusion"], m_raw["confusion"])


# --------------------------------------------------------------------------
# the real thing: 2 OS processes, jax.distributed over localhost, 4 fake
# CPU devices each -> an 8-device global mesh split across hosts
# --------------------------------------------------------------------------

def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_process_cli(coco_root, tmp_path, extra_args):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
        }
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
            "ARSVT_PLATFORM": "cpu",
            "ARSVT_DISABLE_PALLAS": "1",
            "ARSVT_MULTIHOST": "1",
            "ARSVT_COORDINATOR_ADDRESS": f"localhost:{port}",
            "ARSVT_NUM_PROCESSES": "2",
            "ARSVT_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO,
        })
        cwd = tmp_path / f"proc{pid}"
        cwd.mkdir()
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "arsvt_tpu.train.cli",
             "--train-preset", "smoke", "--data-dir", coco_root,
             "--batch-size", "8", "--total-steps", "4",
             "--schedule", "plateau", "--eval-every", "2",
             "--log-every", "2", "--bf16", "false",
             ] + extra_args,
            cwd=cwd, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    rows = [
        json.loads(line)
        for line in (tmp_path / "proc0" / "metrics.jsonl").read_text()
        .splitlines()
        if line.strip().startswith("{")
    ]
    return [r for r in rows if any(k.startswith("val/") for k in r)]


@pytest.mark.slow
def test_two_process_plateau_classification(coco_root, tmp_path):
    """The plateau schedule — unusable on pods before this round — trains
    under a real 2-process runtime: the 9-image val split shards 5/4, so
    without padded equal shards the first eval cadence would deadlock."""
    val_rows = _run_two_process_cli(
        coco_root, tmp_path,
        ["--preset", "vit_test_8_32", "--augment", "none",
         "--image-size", "32"],
    )
    assert len(val_rows) == 2  # eval at steps 2 and 4
    for r in val_rows:
        assert np.isfinite(r["val/loss"])
        assert 0.0 <= r["val/accuracy"] <= 1.0


@pytest.mark.slow
def test_two_process_detection_eval_map(coco_root, tmp_path):
    """Detection multi-host eval: the replicate-gather path must hand every
    host the identical global detections so val mAP is well-defined."""
    val_rows = _run_two_process_cli(
        coco_root, tmp_path,
        ["--preset", "detector_test", "--task", "detect",
         "--canvas", "32", "--max-objects", "4"],
    )
    assert len(val_rows) == 2
    for r in val_rows:
        assert np.isfinite(r["val/loss"])
        assert "val/mAP" in r
