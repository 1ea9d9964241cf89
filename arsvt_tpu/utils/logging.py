"""Metric logging: JSONL files + stdout (+ wandb when importable).

Replaces the reference's offline-wandb-only logging
(/root/reference/train.py:1508-1511,1470-1477) with deterministic JSONL
metric files (SURVEY.md §5 "Metrics"); wandb remains an optional sink gated
on importability, never a hard dependency.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from typing import Any


class MetricLogger:
    def __init__(self, out_dir: str | None = None, *, use_wandb: bool = False,
                 run_config: dict | None = None, quiet: bool = False):
        self._quiet = quiet
        self._fh = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(mode="offline", config=run_config or {})
            except ImportError:
                pass
        self._t0 = time.time()

    def log(self, step: int, metrics: dict[str, Any], *, prefix: str = ""):
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                # arrays (confusion matrices, per-class vectors) and other
                # non-scalars must still produce a valid JSON line
                rec[key] = v.tolist() if hasattr(v, "tolist") else v
        if self._fh:
            # bare NaN/Infinity tokens are invalid JSON (RFC 8259) — they'd
            # corrupt metrics.jsonl exactly when a diverged run needs
            # post-mortem parsing. Sanitize ONLY the jsonl payload; wandb
            # below still receives the native float('nan') it handles.
            safe = {
                k: (v if not isinstance(v, float) or math.isfinite(v)
                    else str(v))
                for k, v in rec.items()
            }
            self._fh.write(json.dumps(safe, default=str) + "\n")
            self._fh.flush()
        if self._wandb:
            self._wandb.log(rec, step=step)
        if not self._quiet:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k not in ("time",)
            )
            print(parts, file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
        if self._wandb:
            self._wandb.finish()


class Throughput:
    """images/sec meter (the north-star metric, BASELINE.json)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t = time.perf_counter()
        self._images = 0

    def add(self, n: int):
        self._images += n

    def rate(self) -> float:
        dt = time.perf_counter() - self._t
        return self._images / dt if dt > 0 else 0.0
