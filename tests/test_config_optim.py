"""Config serialization round-trip and optimizer/schedule behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.train.config import TRAIN_PRESETS, TrainConfig
from arsvt_tpu.train.optim import (
    PlateauState,
    make_optimizer,
    make_schedule,
    set_lr_scale,
)


def test_config_json_roundtrip():
    cfg = TRAIN_PRESETS["vit_base_finetune"].with_overrides(seed=7)
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_config_ignores_unknown_fields():
    import json

    d = json.loads(TrainConfig().to_json())
    d["some_future_field"] = 123
    cfg = TrainConfig.from_json(json.dumps(d))
    assert cfg == TrainConfig()


def test_cosine_schedule_shape():
    cfg = TrainConfig(schedule="cosine", warmup_steps=10, total_steps=100,
                      learning_rate=1e-3)
    sched = make_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(99)) < 1e-4  # decayed near the end


def test_plateau_state_mirrors_reference_scheduler():
    # ReduceLROnPlateau(factor=.7, patience=1) semantics (train.py:1363-1367)
    cfg = TrainConfig(schedule="plateau", plateau_factor=0.7,
                      plateau_patience=1, learning_rate=1e-4)
    st = PlateauState()
    st = st.update(1.0, cfg)      # improvement -> no change
    assert st.scale == 1.0 and st.bad_epochs == 0
    st = st.update(1.1, cfg)      # worse #1 -> within patience
    assert st.scale == 1.0 and st.bad_epochs == 1
    st = st.update(1.2, cfg)      # worse #2 -> cut lr
    np.testing.assert_allclose(st.scale, 0.7)
    st = st.update(0.5, cfg)      # new best
    assert st.best == 0.5 and st.bad_epochs == 0
    np.testing.assert_allclose(st.scale, 0.7)  # scale persists


def test_plateau_threshold_is_relative():
    """torch ReduceLROnPlateau threshold_mode='rel' (the default; the
    reference passes threshold=1e-3, train.py:1366,1611): a val loss
    creeping down by <0.1%/epoch is a plateau, not an improvement —
    improvement requires metric < best * (1 - 1e-3)."""
    cfg = TrainConfig(schedule="plateau", plateau_factor=0.7,
                      plateau_patience=1, learning_rate=1e-4)
    st = PlateauState()
    st = st.update(1.0, cfg)
    st = st.update(0.9996, cfg)   # -0.04% — inside the 0.1% band: bad #1
    assert st.bad_epochs == 1 and st.best == 1.0
    st = st.update(0.9992, cfg)   # still creeping: bad #2 -> cut lr
    np.testing.assert_allclose(st.scale, 0.7)
    st = st.update(0.99, cfg)     # -1% — a real improvement
    assert st.best == 0.99 and st.bad_epochs == 0


def test_plateau_min_lr_floor():
    cfg = TrainConfig(schedule="plateau", plateau_factor=0.1,
                      plateau_patience=0, learning_rate=1e-4,
                      plateau_min_lr=1e-6)
    st = PlateauState()
    for _ in range(10):
        st = st.update(2.0, cfg)
    assert st.scale >= 1e-6 / 1e-4 - 1e-12


def test_set_lr_scale_changes_update_size():
    cfg = TrainConfig(schedule="constant", warmup_steps=0,
                      learning_rate=1e-2, grad_clip_norm=1e9,
                      weight_decay=0.0)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    up1, state1 = opt.update(grads, state, params)
    scaled = set_lr_scale(state, 0.5)
    up2, _ = opt.update(grads, scaled, params)
    ratio = float(up2["w"][0] / up1["w"][0])
    np.testing.assert_allclose(ratio, 0.5, rtol=1e-5)
    # pure: the input state's multiplier is untouched
    np.testing.assert_allclose(float(state.hyperparams["lr_scale"]), 1.0)


def test_weight_decay_mask():
    cfg = TrainConfig(weight_decay=0.1, grad_clip_norm=1e9,
                      schedule="constant", warmup_steps=0)
    opt = make_optimizer(cfg)
    params = {
        "blocks": {"ln1": {"scale": jnp.ones((2, 8))},
                   "mlp": {"fc1": {"kernel": jnp.ones((2, 8, 16))}}},
        "cls_token": jnp.ones((1, 1, 8)),
        "head": {"kernel": jnp.ones((8, 6)), "bias": jnp.zeros((6,))},
    }
    state = opt.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    up, _ = opt.update(zeros, state, params)
    # decayed: matrices
    assert float(jnp.abs(up["head"]["kernel"]).sum()) > 0
    assert float(jnp.abs(up["blocks"]["mlp"]["fc1"]["kernel"]).sum()) > 0
    # not decayed: LN scale, tokens, biases
    assert float(jnp.abs(up["blocks"]["ln1"]["scale"]).sum()) == 0
    assert float(jnp.abs(up["cls_token"]).sum()) == 0
    assert float(jnp.abs(up["head"]["bias"]).sum()) == 0


def test_fused_adamw_matches_optax():
    """fused_adamw_update (jnp fallback path here; the Pallas kernel is the
    same math, pinned on TPU by test_pallas_kernels) must reproduce the
    optax chain step-for-step: params, moments, counts, and a mid-run
    plateau lr_scale change."""
    import optax

    from arsvt_tpu.train.optim import fused_adamw_update

    cfg = TrainConfig(
        schedule="cosine", warmup_steps=3, total_steps=20,
        learning_rate=3e-3, weight_decay=0.05, grad_clip_norm=0.1,
    )
    opt = make_optimizer(cfg)
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(16,)), jnp.float32),
    }
    p_ref, s_ref = params, opt.init(params)
    p_fus, s_fus = params, opt.init(params)
    for step in range(6):
        grads = {
            "w": jnp.asarray(rng.normal(size=(8, 16)) * (1 + step),
                             jnp.float32),
            "b": jnp.asarray(rng.normal(size=(16,)), jnp.float32),
        }
        if step == 3:  # plateau controller kicks mid-run
            s_ref = set_lr_scale(s_ref, 0.7)
            s_fus = set_lr_scale(s_fus, 0.7)
        updates, s_ref = opt.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_fus, s_fus, _ = fused_adamw_update(cfg, grads, s_fus, p_fus)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_fus[k]), np.asarray(p_ref[k]), rtol=2e-6, atol=1e-7
        )
    ref_leaves = jax.tree_util.tree_leaves(s_ref)
    fus_leaves = jax.tree_util.tree_leaves(s_fus)
    assert jax.tree_util.tree_structure(s_ref) == \
        jax.tree_util.tree_structure(s_fus)
    for a, b in zip(ref_leaves, fus_leaves):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-6, atol=1e-7,
        )


def test_fused_adamw_kernel_interpret_matches_jnp():
    """The Pallas kernel itself (interpret mode — elementwise, cheap on
    CPU) against the identical-math jnp fallback, both wd variants."""
    from arsvt_tpu.ops.pallas.fused_adamw import (
        _adamw_leaf_jnp,
        _adamw_leaf_pallas,
    )

    rng = np.random.default_rng(1)
    shape = (4, 520, 128)  # rows=2080 exercises a non-trivial block split
    mk = lambda: jnp.asarray(rng.normal(size=shape), jnp.float32)  # noqa
    g, m, v, p = mk(), jnp.abs(mk()) * 1e-2, jnp.abs(mk()) * 1e-4, mk()
    scalars = jnp.asarray([0.5, 0.1, 0.001, 3e-4], jnp.float32)
    for wd in (0.0, 0.05):
        out_k = _adamw_leaf_pallas(scalars, g, m, v, p, b1=0.9, b2=0.999,
                                   eps=1e-8, wd=wd, interpret=True)
        out_j = _adamw_leaf_jnp(scalars, g, m, v, p, b1=0.9, b2=0.999,
                                eps=1e-8, wd=wd)
        for a, b in zip(out_k, out_j):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
