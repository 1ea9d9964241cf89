"""Model-layer tests: shapes, determinism, DeiT/ViT variants, detector."""

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.models import (
    apply_backbone,
    apply_detector,
    apply_image_classifier,
    init_backbone,
    init_detector,
    init_image_classifier,
)
from arsvt_tpu.models.registry import PRESETS, DETECTOR_PRESETS


def test_backbone_shapes_vit():
    cfg = PRESETS["vit_test_8_32"]
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    imgs = jnp.ones((2, 32, 32, 3))
    tokens = apply_backbone(params, imgs, cfg)
    assert tokens.shape == (2, cfg.seq_len, cfg.embed_dim)
    assert cfg.seq_len == 16 + 1


def test_backbone_shapes_deit():
    cfg = PRESETS["deit_test_8_32"]
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    tokens = apply_backbone(params, jnp.ones((2, 32, 32, 3)), cfg)
    assert tokens.shape == (2, 16 + 2, cfg.embed_dim)
    assert "dist_token" in params


def test_backbone_deterministic_eval():
    cfg = PRESETS["vit_test_8_32"]
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t1 = apply_backbone(params, imgs, cfg)
    t2 = apply_backbone(params, imgs, cfg)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_dropout_train_vs_eval():
    cfg = PRESETS["vit_test_8_32"].__class__(
        **{**PRESETS["vit_test_8_32"].__dict__, "dropout": 0.5}
    )
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    te = apply_backbone(params, imgs, cfg, train=False)
    tt = apply_backbone(params, imgs, cfg, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(te), np.asarray(tt))
    # same key -> same output
    tt2 = apply_backbone(params, imgs, cfg, train=True, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(tt), np.asarray(tt2))


def test_classifier_end_to_end():
    cfg = PRESETS["vit_test_8_32"]
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, num_classes=6)
    logits = apply_image_classifier(params, jnp.ones((3, 32, 32, 3)), cfg, 6)
    assert logits.shape == (3, 6)
    assert logits.dtype == jnp.float32


def test_classifier_jit_and_bf16():
    cfg = PRESETS["deit_test_8_32"]
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, num_classes=6)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    @jax.jit
    def f(p, x):
        return apply_image_classifier(p, x.astype(jnp.bfloat16), cfg, 6)

    logits = f(params, imgs)
    assert logits.shape == (2, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_detector_outputs():
    cfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = apply_detector(params, imgs, cfg)
    assert out["class_logits"].shape == (2, 5, 7)  # 6 classes + background
    assert out["boxes_cxcywh"].shape == (2, 5, 4)
    boxes = np.asarray(out["boxes_cxcywh"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_detector_triplet_features():
    cfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(0), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out, feats = apply_detector(params, imgs, cfg, return_features=True)
    assert feats.shape == (2, cfg.triplet_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
    )


def test_grads_flow():
    cfg = PRESETS["vit_test_8_32"]
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, num_classes=6)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    labels = jnp.array([0, 3])

    def loss_fn(p):
        logits = apply_image_classifier(p, imgs, cfg, 6)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(2), labels])

    grads = jax.grad(loss_fn)(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x)), grads, 0.0
    )
    assert float(gnorm) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_attn_dropout_routes_and_randomizes():
    """attn_dropout (train.py:528,545 parity option) is active only in
    training and produces key-dependent outputs."""
    import dataclasses

    from arsvt_tpu.models.vit import apply_backbone, init_backbone

    cfg = dataclasses.replace(PRESETS["vit_test_8_32"], attn_dropout=0.5)
    params = init_backbone(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    e1 = apply_backbone(params, x, cfg, train=False)
    e2 = apply_backbone(params, x, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    t1 = apply_backbone(params, x, cfg, train=True, rng=jax.random.PRNGKey(2))
    t2 = apply_backbone(params, x, cfg, train=True, rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    assert not np.allclose(np.asarray(t1), np.asarray(e1))


def test_detr_head_depth1_return_aux_is_none():
    """A depth-1 decoder with return_aux=True must not crash (round-1
    ADVICE item): there are no intermediate layers to supervise."""
    import dataclasses

    from arsvt_tpu.models.detector import apply_detector, init_detector

    det = dataclasses.replace(
        DETECTOR_PRESETS["detector_test"],
        head=dataclasses.replace(DETECTOR_PRESETS["detector_test"].head,
                                 depth=1),
    )
    params = init_detector(jax.random.PRNGKey(0), det)
    out = apply_detector(
        params, jnp.zeros((2, 32, 32, 3)), det, return_aux=True,
    )
    assert "aux" not in out
    assert out["class_logits"].shape[1] == det.head.num_queries


def test_evaluate_classifier_normalize_switch():
    """The standalone eval API must honor the checkpoint's preprocessing
    contract: normalize_inputs=True routes through eval_preprocess."""
    import numpy as np

    from arsvt_tpu.evaluation.classify import evaluate_classifier
    from arsvt_tpu.models.classifier import init_image_classifier
    from arsvt_tpu.models.registry import get_preset

    cfg = get_preset("vit_test_8_32")
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, 6)
    batch = {
        "image": (np.random.default_rng(0).uniform(size=(4, 32, 32, 3)) * 255)
        .astype(np.uint8),
        "label": np.asarray([0, 1, 2, 3], np.int32),
    }
    for normalize_inputs in (False, True):
        res = evaluate_classifier(
            params, iter([batch]), cfg, 6, compute_dtype=jnp.float32,
            normalize_inputs=normalize_inputs,
        )
        assert res["n"] == 4 and 0.0 <= res["top1"] <= 1.0
