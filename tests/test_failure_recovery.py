"""Failure recovery: a crash mid-training persists progress for --resume."""

import numpy as np
import pytest

from arsvt_tpu.data.synthetic import synthetic_classification_batches
from arsvt_tpu.parallel.mesh import MeshConfig, make_mesh
from arsvt_tpu.train.config import TRAIN_PRESETS
from arsvt_tpu.train.trainer import Trainer


def test_crash_saves_checkpoint(tmp_path):
    mesh = make_mesh(MeshConfig(), platform="cpu")
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=20, checkpoint_every=100, log_every=10**9,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    tr = Trainer(cfg, mesh=mesh)

    inner = synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0
    )

    def crashing_batches():
        for i in range(7):
            yield next(inner)
        raise RuntimeError("simulated data-source failure")

    with pytest.raises(RuntimeError, match="simulated"):
        tr.fit(crashing_batches())

    # a fresh trainer resumes from the emergency checkpoint
    tr2 = Trainer(cfg, mesh=mesh)
    resumed = tr2.maybe_resume()
    assert resumed == 7
    last = tr2.fit(inner)
    assert np.isfinite(last["loss"])
