"""Optimizer & LR schedules.

Reference: AdamW(lr 1e-4, wd 1e-4) + ReduceLROnPlateau(factor .7, patience 1,
min 1e-7) stepped on val loss (/root/reference/train.py:1598-1615,1631), plus
CUDA GradScaler. TPU-native: optax AdamW chained after global-norm clipping;
bf16 needs no loss scaling. Schedules: cosine-with-warmup (the fine-tune
default), constant, and a functional plateau controller that reproduces the
reference's scheduler as explicit state (scale, best, bad_epochs) threaded
through the host loop — not hidden mutable state.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax

from arsvt_tpu.train.config import TrainConfig


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
            end_value=cfg.learning_rate * cfg.min_lr_ratio,
        )
    if cfg.schedule in ("constant", "plateau"):
        # plateau scaling is applied multiplicatively via PlateauState
        if cfg.warmup_steps > 0:
            return optax.linear_schedule(
                0.0, cfg.learning_rate, cfg.warmup_steps
            )
        return optax.constant_schedule(cfg.learning_rate)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainConfig):
    """Returns an optax.GradientTransformation; lr is schedule * plateau scale.

    The plateau scale rides in as an extra `scale_by_learning_rate`-style
    multiplier through `optax.inject_hyperparams` so the host loop can set it
    without recompiling the step.
    """
    schedule = make_schedule(cfg)

    @optax.inject_hyperparams
    def make(lr_scale):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
            optax.add_decayed_weights(cfg.weight_decay, mask=_wd_mask),
            optax.scale_by_schedule(schedule),
            optax.scale_by_learning_rate(lr_scale, flip_sign=True),
        )

    return make(lr_scale=1.0)


def _wd_mask(params):
    """Decay only matrices: no weight decay on biases, LN params, tokens.

    (Standard ViT practice; the reference decays everything, train.py:1598.)
    """
    import jax

    def leaf(path, x):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if x.ndim <= 1 + ("blocks" in name):  # stacked biases have ndim 2
            return False
        if any(t in name for t in ("token", "pos_embed", "queries", "ln")):
            return False
        return True

    return jax.tree_util.tree_map_with_path(leaf, params)


@dataclasses.dataclass
class PlateauState:
    """Functional ReduceLROnPlateau (train.py:1363-1367 semantics)."""

    scale: float = 1.0
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, metric: float, cfg: TrainConfig) -> "PlateauState":
        if metric < self.best - 1e-8:
            return PlateauState(self.scale, metric, 0)
        bad = self.bad_epochs + 1
        if bad > cfg.plateau_patience:
            floor = cfg.plateau_min_lr / max(cfg.learning_rate, 1e-30)
            return PlateauState(
                max(self.scale * cfg.plateau_factor, floor), self.best, 0
            )
        return PlateauState(self.scale, self.best, bad)


def set_lr_scale(opt_state, scale: float):
    """Set the injected plateau multiplier on an inject_hyperparams state."""
    opt_state.hyperparams["lr_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state
