"""Training loop: the L4 engine (SURVEY.md §1), rebuilt TPU-first.

vs the reference's `main()` + `train_one_epoch` (/root/reference/train.py:
1507-1670): one jitted step, batches arrive already sharded over the data
axis, device metrics are fetched only at log cadence (no per-step
`losses.item()` sync — train.py:1462), checkpoint/resume actually works,
and the plateau scheduler is explicit functional state.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import jax
import numpy as np

from arsvt_tpu.parallel.mesh import MeshConfig, make_mesh
from arsvt_tpu.parallel.multihost import global_batch_from_local
from arsvt_tpu.train.checkpoint import CheckpointManager
from arsvt_tpu.train.config import TrainConfig
from arsvt_tpu.train.optim import PlateauState, set_lr_scale
from arsvt_tpu.train.train_step import make_classifier_step_fns
from arsvt_tpu.utils.logging import MetricLogger, Throughput


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        *,
        mesh=None,
        logger: MetricLogger | None = None,
        step_fns=None,
    ):
        self.cfg = cfg
        self.mesh = mesh or make_mesh(
            MeshConfig(data=cfg.mesh_data, model=cfg.mesh_model)
        )
        if step_fns is None:
            if cfg.task == "detect":
                from arsvt_tpu.train.detect_step import (
                    make_detector_step_fns,
                )

                step_fns = make_detector_step_fns(cfg, self.mesh)
            else:
                step_fns = make_classifier_step_fns(cfg, self.mesh)
        self.init_fn, self.train_step, self.eval_step = step_fns
        self.logger = logger or MetricLogger(quiet=True)
        self.base_rng = jax.random.PRNGKey(cfg.seed)
        self.state = None
        self.plateau = PlateauState()
        self._ckpt = None
        # MFU telemetry: effective TFLOP/s rides next to images/sec in every
        # metrics row (the bench-only computation of round 1, now always on)
        try:
            from arsvt_tpu.utils.flops import train_gflops_per_image

            self._gflops_per_image = train_gflops_per_image(cfg)
        except Exception:
            self._gflops_per_image = 0.0

    # ------------------------------------------------------------- state
    def init_state(self):
        self.state = self.init_fn(jax.random.fold_in(self.base_rng, 0xA11))
        return self.state

    @property
    def ckpt(self) -> CheckpointManager:
        if self._ckpt is None:
            self._ckpt = CheckpointManager(
                self.cfg.checkpoint_dir, self.cfg,
                keep=self.cfg.keep_checkpoints, best_metric="val_loss",
            )
        return self._ckpt

    def maybe_resume(self) -> int:
        """Restore the latest checkpoint if one exists; returns start step."""
        if self.state is None:
            self.init_state()
        if self.ckpt.latest_step is None:
            return 0
        self.state, _ = self.ckpt.restore(self.state)
        # plateau controller counters survive the restart (the lr *scale*
        # rides in opt_state.hyperparams already; best/bad_epochs live here)
        plateau = (self.ckpt.last_extra or {}).get("plateau")
        if plateau:
            self.plateau = PlateauState(**plateau)
        return int(self.state["step"])

    # -------------------------------------------------------------- loop
    def fit(
        self,
        train_batches: Iterator[dict],
        *,
        eval_batches_fn: Callable[[], Iterator[dict]] | None = None,
        steps: int | None = None,
    ):
        cfg = self.cfg
        if self.state is None:
            self.init_state()
        if eval_batches_fn is not None and jax.process_count() > 1:
            # stride-sharded eval streams can yield unequal per-host batch
            # counts (drop_remainder=False tails) — one host would run a
            # collective-bearing eval_step the others never join. Fail at
            # fit() start instead of hanging at the first eval cadence;
            # evaluate offline from the checkpoint on one host.
            raise RuntimeError(
                "multi-host eval is not supported: per-host eval shards "
                "can differ in batch count, deadlocking the collective "
                "eval step. Train without eval_batches_fn (plateau "
                "schedules need it, so use cosine/constant on pods) and "
                "evaluate checkpoints offline on one host."
            )
        steps = steps if steps is not None else cfg.total_steps
        start = int(self.state["step"])
        meter = Throughput()

        try:
            self._fit_loop(train_batches, eval_batches_fn, steps, start, meter)
        except (KeyboardInterrupt, Exception):
            # failure recovery (SURVEY.md §5): persist the last completed
            # step before propagating, so --resume continues from here
            # (regardless of the periodic checkpoint cadence)
            if self.state is not None:
                step_now = int(self.state["step"])
                if step_now > start:
                    try:
                        self.ckpt.save(
                            step_now, jax.device_get(self.state),
                            extra={
                                "plateau": dataclasses.asdict(self.plateau)
                            },
                        )
                        self.ckpt.wait()
                    except Exception as save_err:
                        # never mask the original failure — e.g. orbax's
                        # step-already-exists when the crash lands right
                        # after a periodic save of the same step
                        import sys

                        print(f"emergency checkpoint failed: {save_err}",
                              file=sys.stderr)
            raise
        if self._ckpt is not None:
            self._ckpt.wait()
        return self._last_metrics

    def _fit_loop(self, train_batches, eval_batches_fn, steps, start, meter):
        cfg = self.cfg
        last_val_loss = float("inf")
        last_val_step = -1  # step the loss was measured at, for freshness
        self._last_metrics = {}

        for step in range(start, steps):
            batch = next(train_batches)
            # single-process: plain data-axis placement; multi-host
            # (ARSVT_MULTIHOST): assembles each process's local shard into
            # one global array (parallel/multihost.py)
            batch = global_batch_from_local(batch, self.mesh)
            self.state, metrics = self.train_step(
                self.state, batch, self.base_rng
            )
            meter.add(int(batch["image"].shape[0]))

            if (step + 1) % cfg.log_every == 0 or step + 1 == steps:
                host = {k: float(v) for k, v in metrics.items()}
                host["images_per_sec"] = meter.rate()
                host["tflops"] = (
                    host["images_per_sec"] * self._gflops_per_image / 1e3
                )
                self.logger.log(step + 1, host, prefix="train/")
                self._last_metrics = host
                meter.reset()

            if eval_batches_fn and (step + 1) % cfg.eval_every == 0:
                eval_metrics = self.evaluate(eval_batches_fn())
                self.logger.log(step + 1, eval_metrics, prefix="val/")
                last_val_loss = float(eval_metrics.get("loss", last_val_loss))
                last_val_step = step + 1
                if cfg.schedule == "plateau":
                    self.plateau = self.plateau.update(
                        eval_metrics["loss"], cfg
                    )
                    self.state["opt_state"] = set_lr_scale(
                        self.state["opt_state"], self.plateau.scale
                    )

            # >= 10**9 is the presets' "checkpointing off" sentinel; any
            # smaller cadence keeps the final-step save even for runs
            # shorter than one cadence interval
            ckpt_enabled = cfg.checkpoint_every < 10**9
            if ckpt_enabled and (
                (step + 1) % cfg.checkpoint_every == 0 or step + 1 == steps
            ):
                # device_get: the async save must not race the next step's
                # donated buffers. val_loss rides along ONLY when it was
                # measured at this very step — a stale value would let the
                # best-checkpoint selector attribute an old loss to newer
                # weights (metric-less steps are protected by latest-N
                # retention, never by best-N).
                fresh = last_val_step == step + 1
                self.ckpt.save(
                    step + 1, jax.device_get(self.state),
                    metrics={"val_loss": last_val_loss} if fresh else None,
                    extra={"plateau": dataclasses.asdict(self.plateau)},
                )

    # -------------------------------------------------------------- eval
    def evaluate(self, batches: Iterator[dict]) -> dict:
        """Aggregate eval metrics. Classification batches (with 'correct' /
        'count' / 'confusion') get accuracy + confusion matrix; any other
        scalar metrics (detection loss parts) are averaged over batches.

        Detection runs additionally surface COCO-protocol val mAP/AP50/AP75
        at every eval cadence (the reference plateaus on val loss only and
        never computes mAP at all — evaluation.py:18,593-615): detect
        eval_steps return raw `outputs`, which are post-processed here via
        the same collection path as the offline evaluate_detector.

        Single-host only (any mesh size): see the fit() guard for why
        multi-host eval is rejected."""
        if jax.process_count() > 1:
            raise RuntimeError(
                "multi-host eval is not supported — evaluate offline "
                "from the checkpoint on one host (see Trainer.fit)."
            )
        sums: dict = {}
        confusion = None
        total_correct = total_count = n_batches = 0
        weight_total = 0.0
        ap_preds: list = []
        ap_gts: list = []
        for batch in batches:
            batch = global_batch_from_local(batch, self.mesh)
            m = self.eval_step(self.state["params"], batch)
            # per-batch scalar metrics are means over the batch: weight by
            # batch size so a ragged last batch doesn't skew val loss
            # (mean-of-means would give a 10-image tail the same vote as a
            # 500-image batch — enough to flip plateau / best-checkpoint
            # decisions)
            weight = float(batch["image"].shape[0])
            weight_total += weight
            for k, v in m.items():
                if k == "confusion":
                    c = np.asarray(v)
                    confusion = c if confusion is None else confusion + c
                elif k == "correct":
                    total_correct += int(v)
                elif k == "count":
                    total_count += int(v)
                elif k == "outputs":
                    if self.cfg.task == "detect" and "boxes" in batch:
                        from arsvt_tpu.evaluation.detect import (
                            collect_batch_detections,
                        )

                        _, ap_p, g = collect_batch_detections(
                            v, batch, conf_threshold=0.5, nms_threshold=0.5,
                        )
                        ap_preds.extend(ap_p)
                        ap_gts.extend(g)
                else:
                    sums[k] = sums.get(k, 0.0) + float(v) * weight
            n_batches += 1
        if n_batches == 0:
            return {"loss": float("nan"), "accuracy": 0.0}
        out = {k: v / weight_total for k, v in sums.items()}
        if total_count:
            out["accuracy"] = total_correct / total_count
        if confusion is not None:
            out["confusion"] = confusion.tolist()
        if ap_preds:
            from arsvt_tpu.evaluation.detect import average_precision

            ap = average_precision(
                ap_preds, ap_gts, num_classes=self.cfg.num_classes
            )
            out["mAP"] = ap["mAP"]
            out["AP50"] = ap["AP50"]
            out["AP75"] = ap["AP75"]
        return out
