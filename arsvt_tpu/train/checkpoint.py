"""Config-bound orbax checkpointing with resume.

Fixes two reference defects (SURVEY.md §5):
  * no resume path existed — optimizer state was saved but never loaded
    (/root/reference/train.py:1647-1654);
  * eval could silently load a checkpoint into a *different* architecture via
    `strict=False` (evaluation.py:375-391).
Here every checkpoint carries the full `TrainConfig` JSON; `restore` refuses
to load into a mismatched model config unless explicitly overridden, and
restores params + optimizer state + step + the data-order epoch seed.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from arsvt_tpu.train.config import TrainConfig


class CheckpointManager:
    def __init__(self, directory: str, cfg: TrainConfig, *, keep: int = 3,
                 best_metric: str | None = None, best_mode: str = "min"):
        """`best_metric`: metric key (from the metrics dict passed to
        `save`) that selects the best checkpoint — the reference's
        `best_vit_detector.pth` on lowest val loss (train.py:1645-1654),
        here as an orbax best_fn that also protects the best step from
        garbage collection."""
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._cfg = cfg
        options = dict(create=True, enable_async_checkpointing=True)
        if best_metric:
            best_fn = lambda metrics: float(metrics[best_metric])
            # Passing best_fn alone makes orbax preserve ONLY the best-N
            # (its default swaps LatestN out for BestN), so the most
            # recent checkpoint — the resume point — is deleted the moment
            # its val metric falls out of the top N (e.g. the whole tail
            # of an overfitting run). Preserve latest-N for resume AND the
            # single best for deployment, explicitly. BestN must not keep
            # metric-less steps itself (union semantics would then keep
            # them forever); LatestN covers those.
            from orbax.checkpoint import checkpoint_managers as ocm

            options.update(
                best_fn=best_fn,  # still drives best_step()
                best_mode=best_mode,
                preservation_policy=ocm.AnyPreservationPolicy([
                    ocm.LatestN(n=keep),
                    ocm.BestN(
                        get_metric_fn=best_fn,
                        reverse=(best_mode == "min"),
                        n=1,
                        keep_checkpoints_without_metrics=False,
                    ),
                ]),
            )
        else:
            options["max_to_keep"] = keep
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(**options)
        )

    def save(self, step: int, state: dict, *, metrics: dict | None = None,
             extra: dict | None = None):
        """`extra`: small JSON-able host-side state saved alongside the
        device state — e.g. the plateau controller's counters, which the
        reference's scheduler kept as hidden mutable state and lost on
        every restart (it had no resume at all, train.py:1644-1667)."""
        blob = {"train_config": self._cfg.to_json()}
        if extra:
            blob["extra"] = extra
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                config=ocp.args.JsonSave(blob),
            ),
            metrics=metrics,
        )

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    @property
    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, state_like: dict, *, step: int | None = None,
                strict_config: bool = True) -> tuple[dict, TrainConfig]:
        """Restore into the structure of `state_like` (shapes/shardings)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        # config first — refuse a mismatched architecture BEFORE touching the
        # state tree (orbax would otherwise fail with an opaque structure
        # error, or worse, partially restore)
        cfg_only = self._mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )
        saved_cfg = TrainConfig.from_json(cfg_only["config"]["train_config"])
        # host-side extras (plateau counters, ...) for the caller to pick up
        self.last_extra: dict = cfg_only["config"].get("extra", {})
        if strict_config:
            mismatches = _model_config_mismatches(saved_cfg, self._cfg)
            if mismatches:
                raise ValueError(
                    "checkpoint was trained with a different model config "
                    f"({mismatches}); pass strict_config=False to override "
                    "(the reference's silent strict=False loading is the bug "
                    "this guards against)"
                )
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_like),
            ),
        )
        state = restored["state"]
        # orbax drops shardings on some leaves (e.g. scalars); re-place
        # everything with state_like's shardings so a restored state is
        # usable on ANY mesh shape, not just the one it was saved under
        def replace(like, x):
            if hasattr(like, "sharding"):
                return jax.device_put(x, like.sharding)
            return x

        state = jax.tree_util.tree_map(replace, state_like, state)
        return state, saved_cfg

    def close(self):
        self._mgr.close()


_MODEL_FIELDS = ("preset", "task", "num_classes", "image_size")


def _model_config_mismatches(a: TrainConfig, b: TrainConfig) -> dict[str, Any]:
    return {
        f: (getattr(a, f), getattr(b, f))
        for f in _MODEL_FIELDS
        if getattr(a, f) != getattr(b, f)
    }


def load_for_eval(directory: str, cfg: TrainConfig, state_like: dict,
                  *, step: int | None = None):
    """Eval-side loader: restore params bound to their training config."""
    mgr = CheckpointManager(directory, cfg)
    try:
        state, saved_cfg = mgr.restore(state_like, step=step)
    finally:
        mgr.close()
    return state, saved_cfg


def latest_step(directory: str) -> int | None:
    """Most recent checkpoint step in `directory` (None when empty)."""
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    try:
        return mgr.latest_step()
    finally:
        mgr.close()


def load_params_for_eval(directory: str, cfg: TrainConfig, params_like,
                         *, step: int | None = None):
    """Restore ONLY the params subtree, config-bound.

    For frozen consumers (distillation teacher, inference) that never need
    the optimizer state: a full `load_for_eval` deserializes the Adam
    moments too — ~2x the parameter bytes of disk reads and allocations —
    only to be discarded. orbax `partial_restore` skips those leaves
    entirely. The same strict config binding as `CheckpointManager.restore`
    applies."""
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    try:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
        blob = mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )
        saved_cfg = TrainConfig.from_json(blob["config"]["train_config"])
        mismatches = _model_config_mismatches(saved_cfg, cfg)
        if mismatches:
            raise ValueError(
                "checkpoint was trained with a different model config "
                f"({mismatches})"
            )
        # PyTreeRestore does NOT lift shardings off the item template's
        # leaves — without explicit restore_args it falls back to the
        # sharding file saved with the checkpoint, whose devices need not
        # exist on the restoring host (a ckpt saved on an 8-device mesh
        # must load on a 1-chip serving box). Build concrete per-leaf
        # restore args from params_like so deserialization always lands
        # on THIS host's devices.
        item = {"params": params_like}
        restore_args = ocp.checkpoint_utils.construct_restore_args(item)
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.PyTreeRestore(
                    item=item, restore_args=restore_args,
                    partial_restore=True,
                )
            ),
        )
        params = restored["state"]["params"]

        def replace(like, x):
            if hasattr(like, "sharding"):
                return jax.device_put(x, like.sharding)
            return x

        params = jax.tree_util.tree_map(replace, params_like, params)
        return params, saved_cfg
    finally:
        mgr.close()


def peek_config(directory: str, *, step: int | None = None) -> TrainConfig:
    """Read only the TrainConfig stored in a checkpoint (no state restore).

    Lets a consumer (eval CLI, distillation teacher loading) reconstruct the
    exact trained architecture before building any params — the opposite of
    the reference's strict=False guessing (evaluation.py:375-391)."""
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    try:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {directory}")
        blob = mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )
        return TrainConfig.from_json(blob["config"]["train_config"])
    finally:
        mgr.close()
