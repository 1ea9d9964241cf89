"""Profiling & sanitizer hooks (SURVEY.md §5 tracing / race-detection rows).

The reference has no profiling beyond tqdm bars (train.py:1430) and no
sanitizers. Here:

  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    Perfetto/TensorBoard trace of the wrapped steps;
  * `StepTimer` — wall-clock per-step timing with warmup discard and
    percentile summary (feeds the images/sec/chip north-star metric);
  * `assert_all_finite(tree)` — host-side NaN/Inf guard for params/grads
    (jit purity makes data races structurally absent; NaN guards are the
    remaining numeric sanitizer). `enable_nan_checks()` flips JAX's global
    debug_nans for tests.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self._warmup = warmup
        self._times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, *exc):
        # a step body that raised exited early — recording its partial
        # duration would pollute the mean/p50/p99 summary
        if exc_type is None:
            self._times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        times = np.asarray(self._times[self._warmup:])
        if times.size == 0:
            return {}
        return {
            "steps": int(times.size),
            "mean_ms": float(times.mean() * 1e3),
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p99_ms": float(np.percentile(times, 99) * 1e3),
        }


def assert_all_finite(tree, name: str = "tree"):
    bad = []

    def check(path, x):
        # dtype.kind == "f" misses ml_dtypes customs (bfloat16/float8 have
        # kind 'V') — in a bf16-first framework the guard must cover them,
        # so test against jnp.inexact instead and upcast for isfinite
        arr = np.asarray(x)
        import jax.numpy as jnp

        if jnp.issubdtype(arr.dtype, jnp.inexact) and not np.isfinite(
            arr.astype(np.float32)
            if arr.dtype.kind not in "fc" else arr
        ).all():
            bad.append("/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            ))
        return x

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:10]}")


def enable_nan_checks(on: bool = True):
    jax.config.update("jax_debug_nans", on)
