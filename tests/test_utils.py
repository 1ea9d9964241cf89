"""utils/: the FLOP model behind every TFLOP/s number, profiling guards.

The analytic model was validated against torch.profiler to 0.1%
(benchmarks/torch_flop_check.py, PERFORMANCE.md "grounding the GPU
proxy"); these tests pin the validated values so a silent edit to
utils/flops.py cannot skew bench.py's effective-TFLOP/s or the trainer's
telemetry without failing the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.models.registry import get_preset
from arsvt_tpu.utils.flops import (
    backbone_fwd_gflops,
    train_flops_multiplier,
    train_gflops_per_image,
)


def test_vit_b_fwd_gflops_pinned():
    # 35.13 GFLOP/img measured by torch.profiler(with_flops=True) on the
    # reference-pattern ViT-B/16 @224 (benchmarks/torch_flop_check.py);
    # analytic model matched to 0.1%
    got = backbone_fwd_gflops(get_preset("vit_base_16_224"))
    assert abs(got - 35.13) / 35.13 < 0.005, got


def test_train_flops_multiplier_table():
    assert train_flops_multiplier(False) == 3.0
    assert train_flops_multiplier(True, "full") == 4.0
    assert train_flops_multiplier(True, "all_but_mlp") == 3.3
    assert train_flops_multiplier(True, "mlp_tail") == 3.05


def test_train_gflops_per_image_tasks():
    from arsvt_tpu.train.config import TRAIN_PRESETS

    clf = train_gflops_per_image(
        TRAIN_PRESETS["vit_base_bf16_flash"].with_overrides(remat=False)
    )
    # no-remat train step = 3x the 35.13 forward (+ the tiny head)
    assert abs(clf - 3 * 35.13) / (3 * 35.13) < 0.01, clf
    det = train_gflops_per_image(TRAIN_PRESETS["deit_detector_ref"])
    assert det > 0


def test_assert_all_finite_raises_with_path():
    from arsvt_tpu.utils.profiling import assert_all_finite

    good = {"a": jnp.ones((2, 2)), "b": {"c": jnp.zeros(3)}}
    assert_all_finite(good, "good")  # no raise
    bad = {"a": jnp.ones((2, 2)),
           "b": {"c": jnp.array([1.0, float("nan"), 2.0])}}
    with pytest.raises(FloatingPointError, match="b.*c"):
        assert_all_finite(bad, "state")


def test_step_timer_summary():
    from arsvt_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            np.dot(np.ones((50, 50)), np.ones((50, 50)))
    s = t.summary()
    assert s["steps"] == 3  # warmup step excluded
    assert s["mean_ms"] >= 0.0 and s["p99_ms"] >= s["p50_ms"]


def test_metric_logger_jsonl_round_trip(tmp_path, capsys):
    import json

    from arsvt_tpu.utils.logging import MetricLogger

    lg = MetricLogger(out_dir=str(tmp_path), quiet=True)
    lg.log(5, {"loss": jnp.asarray(1.5), "mAP": 0.25}, prefix="val/")
    lg.log(10, {"loss": 1.25})
    rows = [json.loads(line) for line in
            open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 5 and rows[0]["val/loss"] == 1.5
    assert rows[0]["val/mAP"] == 0.25
    assert rows[1]["step"] == 10 and rows[1]["loss"] == 1.25


def test_throughput_meter():
    import time as _time

    from arsvt_tpu.utils.logging import Throughput

    m = Throughput()
    m.add(100)
    _time.sleep(0.05)
    r = m.rate()
    assert 100 < r < 100 / 0.05 * 1.5  # images/sec over elapsed wall time
    m.reset()
    assert m.rate() == 0.0


def test_assert_all_finite_catches_bf16():
    """ml_dtypes customs (bfloat16: numpy kind 'V') must not slip past the
    NaN guard in a bf16-first framework."""
    import jax.numpy as jnp
    import pytest

    from arsvt_tpu.utils.profiling import assert_all_finite

    good = {"w": jnp.ones((4,), jnp.bfloat16)}
    assert_all_finite(good)  # no raise
    bad = {"w": jnp.array([1.0, float("nan")], jnp.bfloat16)}
    with pytest.raises(FloatingPointError, match="w"):
        assert_all_finite(bad)


def test_metric_logger_nonfinite_and_arrays_stay_valid_json(tmp_path):
    """NaN/Infinity are invalid bare JSON tokens and arrays are not
    serializable — both must still produce parseable metrics.jsonl lines
    (post-mortem parsing matters most exactly when a run diverges)."""
    import json

    import numpy as np

    from arsvt_tpu.utils.logging import MetricLogger

    lg = MetricLogger(out_dir=str(tmp_path), quiet=True)
    lg.log(1, {"loss": float("nan"), "lr": float("inf"),
               "confusion": np.eye(2, dtype=np.int64)})
    lg.close()
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    rec = json.loads(lines[-1])  # strict parser must accept the line
    assert rec["loss"] == "nan" and rec["lr"] == "inf"
    assert rec["confusion"] == [[1, 0], [0, 1]]


def test_step_timer_skips_raising_steps():
    import pytest

    from arsvt_tpu.utils.profiling import StepTimer

    t = StepTimer(warmup=0)
    with t:
        pass
    with pytest.raises(RuntimeError):
        with t:
            raise RuntimeError("boom")
    assert t.summary()["steps"] == 1  # the aborted step is not recorded
