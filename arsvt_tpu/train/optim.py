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

import jax
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
        # torch's default threshold_mode='rel' with mode='min'
        # (train.py:1611 passes threshold=1e-3): improvement means
        # metric < best * (1 - threshold), so a val loss creeping down by
        # less than 0.1% per epoch still counts as a plateau and decays
        # the lr — an absolute epsilon would never fire there.
        if metric < self.best * (1.0 - cfg.plateau_threshold):
            return PlateauState(self.scale, metric, 0)
        bad = self.bad_epochs + 1
        if bad > cfg.plateau_patience:
            floor = cfg.plateau_min_lr / max(cfg.learning_rate, 1e-30)
            return PlateauState(
                max(self.scale * cfg.plateau_factor, floor), self.best, 0
            )
        return PlateauState(self.scale, self.best, bad)


def set_lr_scale(opt_state, scale: float):
    """Return the inject_hyperparams state with the plateau multiplier set.

    Pure: the input state is untouched (a retained reference — e.g. a
    best-checkpoint state held for rollback — must not change under the
    caller's feet)."""
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["lr_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


# ------------------------------------------------------- fused AdamW path
#
# cfg.fused_adamw=True: the whole optimizer update (clip → adam moments →
# bias correction → weight decay → schedule·lr step → apply) runs as ONE
# Pallas pass per leaf (ops/pallas/fused_adamw.py) instead of the optax
# chain's several HBM sweeps. Math and state layout are exactly the chain's
# — `fused_adamw_update(cfg, grads, opt_state, params)` consumes and
# produces `make_optimizer(cfg)` states, so checkpoints interoperate and
# tests pin step-for-step equality (test_fused_adamw_matches_optax).


def _find_state(opt_state, cls):
    """Locate the unique instance of an optax state class in the chain."""
    hits = [
        s for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, cls)
        )
        if isinstance(s, cls)
    ]
    if len(hits) != 1:
        raise ValueError(
            f"expected exactly one {cls.__name__} in the optimizer state, "
            f"found {len(hits)} — fused_adamw requires make_optimizer's chain"
        )
    return hits[0]


def fused_adamw_update(cfg: TrainConfig, grads, opt_state, params,
                       mesh=None):
    """One-pass AdamW: returns (new_params, new_opt_state, grad_norm).

    Replaces `optimizer.update` + `optax.apply_updates` in the train step
    when cfg.fused_adamw. Scalars (clip factor from the global grad norm,
    bias corrections, schedule(count)·lr_scale step size) are computed here
    and enter the per-leaf kernel via SMEM; the global grad norm is
    returned so the step's metrics reuse it instead of re-reducing.

    The Pallas kernel runs when params are device-local or replicated
    (single chip / pure DP — grads and params are identical on every
    device after the pmean). Under tensor parallelism (mesh model dim > 1,
    weight leaves sharded along `model`) the identical-math jnp path is
    used instead: the update is elementwise, XLA shards it for free, while
    a pallas_call on model-sharded leaves would force all-gathers."""
    import optax._src.transform as _t

    from arsvt_tpu.ops.dispatch import use_pallas
    from arsvt_tpu.ops.pallas.fused_adamw import adamw_leaf

    adam = _find_state(opt_state, _t.ScaleByAdamState)
    sched_state = _find_state(opt_state, _t.ScaleByScheduleState)
    lr_scale = opt_state.hyperparams["lr_scale"]

    gnorm = optax.global_norm(grads)
    max_norm = cfg.grad_clip_norm
    # exact clip_by_global_norm semantics (select, not min)
    gscale = jnp.where(
        gnorm < max_norm, 1.0, max_norm / gnorm.astype(jnp.float32)
    )
    count_inc = optax.safe_increment(adam.count)
    bc1 = 1.0 - cfg.beta1 ** count_inc.astype(jnp.float32)
    bc2 = 1.0 - cfg.beta2 ** count_inc.astype(jnp.float32)
    # scale_by_schedule evaluates at the PRE-increment count
    step = make_schedule(cfg)(sched_state.count) * lr_scale
    scalars = jnp.stack([
        gscale,
        bc1.astype(jnp.float32),
        bc2.astype(jnp.float32),
        step.astype(jnp.float32),
    ])

    from arsvt_tpu.parallel.mesh import MODEL_AXIS

    mask = _wd_mask(params)
    tp = mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1
    kernel_on = use_pallas() and not tp
    outs = jax.tree_util.tree_map(
        lambda g, m, v, p, decayed: adamw_leaf(
            scalars, g, m, v, p, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8,
            wd=cfg.weight_decay if decayed else 0.0, use_kernel=kernel_on,
        ),
        grads, adam.mu, adam.nu, params, mask,
    )
    # tree_map flattens `outs` up to params' structure → o is each (p,m,v)
    new_p = jax.tree_util.tree_map(lambda _, o: o[0], params, outs)
    new_mu = jax.tree_util.tree_map(lambda _, o: o[1], params, outs)
    new_nu = jax.tree_util.tree_map(lambda _, o: o[2], params, outs)

    new_adam = _t.ScaleByAdamState(count=count_inc, mu=new_mu, nu=new_nu)
    new_sched = _t.ScaleByScheduleState(
        count=optax.safe_increment(sched_state.count)
    )

    def swap(s):
        if isinstance(s, _t.ScaleByAdamState):
            return new_adam
        if isinstance(s, _t.ScaleByScheduleState):
            return new_sched
        return s

    new_opt_state = jax.tree_util.tree_map(
        swap, opt_state,
        is_leaf=lambda x: isinstance(
            x, (_t.ScaleByAdamState, _t.ScaleByScheduleState)
        ),
    )
    # inject_hyperparams' own counter (used only for stateful schedules,
    # which make() doesn't use — keep it advancing for state parity)
    if hasattr(new_opt_state, "count"):
        new_opt_state = new_opt_state._replace(
            count=optax.safe_increment(new_opt_state.count)
        )
    return new_p, new_opt_state, gnorm
