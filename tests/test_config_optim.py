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
    set_lr_scale(state, 0.5)
    up2, _ = opt.update(grads, state, params)
    ratio = float(up2["w"][0] / up1["w"][0])
    np.testing.assert_allclose(ratio, 0.5, rtol=1e-5)


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
