"""Visualization smoke: PNG written for pred/GT side-by-side."""

import os

import jax.numpy as jnp
import numpy as np

from arsvt_tpu.evaluation.detect import post_process
from arsvt_tpu.evaluation.visualize import visualize_batch, visualize_predictions


def test_visualize_predictions(tmp_path):
    img = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)
    pred = {
        "boxes": np.array([[0.1, 0.1, 0.5, 0.5]]),
        "labels": np.array([2]),
        "scores": np.array([0.9]),
    }
    gt = {"boxes": np.array([[0.12, 0.1, 0.52, 0.5]]), "labels": np.array([2])}
    out = visualize_predictions(
        img, pred, gt, out_path=str(tmp_path / "viz.png")
    )
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_visualize_batch(tmp_path):
    c = 6
    logits = jnp.zeros((2, 3, c + 1)).at[:, 0, 1].set(6.0)
    boxes = jnp.full((2, 3, 4), 0.4)
    posts = post_process(logits, boxes, conf_threshold=0.5)
    images = np.random.default_rng(1).uniform(size=(2, 32, 32, 3))
    targets = {
        "boxes": np.full((2, 2, 4), 0.4, np.float32),
        "labels": np.ones((2, 2), np.int32),
        "mask": np.array([[True, False], [True, True]]),
    }
    paths = visualize_batch(
        images, posts, targets, out_dir=str(tmp_path), batch_index=0
    )
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)
