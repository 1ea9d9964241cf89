"""Int8 W8A8 inference path: primitive numerics + end-to-end parity.

The quantized serving path (ops/quant.py, models/quantized.py) is a
beyond-reference feature; its oracle is the fp32 forward it approximates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from arsvt_tpu.models.classifier import (
    apply_image_classifier,
    init_image_classifier,
)
from arsvt_tpu.models.quantized import (
    apply_image_classifier_int8,
    quantize_image_classifier,
)
from arsvt_tpu.models.registry import get_preset
from arsvt_tpu.ops.quant import (
    dequantize_weight,
    quant_dense,
    quantize_weight,
)


def test_quantize_weight_roundtrip_error_bounded():
    w = np.random.default_rng(0).normal(size=(64, 96)).astype(np.float32)
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8
    assert qw["scale"].shape == (96,)
    deq = np.asarray(dequantize_weight(qw))
    # symmetric rounding: per-element error <= half a quantization step
    step = np.asarray(qw["scale"])[None, :]
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-6)


def test_quantize_weight_stacked_depth_axis():
    w = np.random.default_rng(1).normal(size=(3, 32, 48)).astype(np.float32)
    qw = quantize_weight(w, axis=-2)
    assert qw["q"].shape == (3, 32, 48)
    assert qw["scale"].shape == (3, 48)
    deq = np.asarray(dequantize_weight(qw, axis=-2))
    np.testing.assert_allclose(deq, w, atol=float(qw["scale"].max()) / 2 + 1e-6)


def test_quant_dense_matches_fp32_matmul():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 128)).astype(np.float32)
    w = rng.normal(size=(128, 256)).astype(np.float32)
    b = rng.normal(size=(256,)).astype(np.float32)
    out = np.asarray(
        quant_dense(jnp.asarray(x), quantize_weight(w), jnp.asarray(b),
                    out_dtype=jnp.float32)
    )
    ref = x @ w + b
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel


def test_quant_dense_batched_rank3():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 17, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    out = np.asarray(
        quant_dense(jnp.asarray(x), quantize_weight(w), out_dtype=jnp.float32)
    )
    ref = x @ w
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert out.shape == (4, 17, 32)
    assert rel < 0.03, rel


def _classifier_fixture(distilled=False):
    cfg = get_preset("vit_test_8_32")
    if distilled:
        import dataclasses

        cfg = dataclasses.replace(cfg, distilled=True)
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, num_classes=6)
    # the head zero-inits (fine-tune practice); give it weights so logits
    # (and argmax) are meaningful for the parity check
    k = jax.random.PRNGKey(7)
    params["classifier"]["head"]["kernel"] = 0.05 * jax.random.normal(
        k, params["classifier"]["head"]["kernel"].shape
    )
    if distilled:
        params["classifier"]["head_dist"]["kernel"] = 0.05 * jax.random.normal(
            jax.random.fold_in(k, 1),
            params["classifier"]["head_dist"]["kernel"].shape,
        )
    images = jnp.asarray(
        np.random.default_rng(5).uniform(size=(32, 32, 32, 3)), jnp.float32
    )
    return cfg, params, images


def test_int8_classifier_matches_fp32_forward():
    cfg, params, images = _classifier_fixture()
    ref = np.asarray(apply_image_classifier(params, images, cfg, 6))
    qparams = quantize_image_classifier(params, cfg)
    # every projection kernel really is int8 (the 4x memory claim)
    assert qparams["backbone"]["blocks"]["mlp"]["fc1"]["kernel"]["q"].dtype \
        == jnp.int8
    out = np.asarray(
        apply_image_classifier_int8(qparams, images, cfg, 6,
                                    compute_dtype=jnp.float32)
    )
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    agree = float(np.mean(out.argmax(-1) == ref.argmax(-1)))
    assert rel < 0.08, rel
    assert agree >= 0.9, agree


def test_int8_classifier_distilled():
    cfg, params, images = _classifier_fixture(distilled=True)
    ref = np.asarray(apply_image_classifier(params, images, cfg, 6))
    qparams = quantize_image_classifier(params, cfg)
    out = np.asarray(
        apply_image_classifier_int8(qparams, images, cfg, 6,
                                    compute_dtype=jnp.float32)
    )
    rel = np.linalg.norm(out - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.08, rel


def test_streaming_classifier_int8_option():
    from arsvt_tpu.evaluation.classify import StreamingClassifier

    cfg, params, images = _classifier_fixture()
    fp = StreamingClassifier(params, cfg, 6, normalize_inputs=False,
                             compute_dtype=jnp.float32)
    q = StreamingClassifier(params, cfg, 6, normalize_inputs=False,
                            compute_dtype=jnp.float32, quantize="int8")
    agree = sum(
        fp(np.asarray(images[i]))[0] == q(np.asarray(images[i]))[0]
        for i in range(8)
    )
    assert agree >= 7, agree
    import pytest

    with pytest.raises(ValueError):
        StreamingClassifier(params, cfg, 6, quantize="int4")


def test_evaluate_classifier_int8_option():
    from arsvt_tpu.evaluation.classify import evaluate_classifier

    cfg, params, images = _classifier_fixture()
    labels = np.asarray(
        apply_image_classifier(params, images, cfg, 6)
    ).argmax(-1)
    batches = [{"image": images, "label": jnp.asarray(labels)}]
    out = evaluate_classifier(params, iter(batches), cfg, 6,
                              compute_dtype=jnp.float32, quantize="int8")
    # labels ARE the fp32 argmax, so top1 here is exactly the int8/fp32
    # argmax agreement rate
    assert out["top1"] >= 0.9, out["top1"]


def _detector_fixture():
    from arsvt_tpu.models.detector import init_detector
    from arsvt_tpu.models.registry import DETECTOR_PRESETS

    cfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        np.random.default_rng(11).uniform(size=(4, 32, 32, 3)), jnp.float32
    )
    return cfg, params, images


def test_int8_detector_matches_fp32_forward():
    from arsvt_tpu.models.detector import apply_detector
    from arsvt_tpu.models.quantized import (
        apply_detector_int8,
        quantize_detector,
    )

    cfg, params, images = _detector_fixture()
    ref = apply_detector(params, images, cfg, train=False)
    qparams = quantize_detector(params, cfg)
    assert qparams["backbone"]["blocks"]["mlp"]["fc1"]["kernel"]["q"].dtype \
        == jnp.int8
    # head stays fp: same leaves object-identical
    assert qparams["detr"] is params["detr"]
    out = apply_detector_int8(qparams, images, cfg,
                              compute_dtype=jnp.float32)
    for k in ("class_logits", "boxes_cxcywh"):
        r = np.asarray(ref[k])
        o = np.asarray(out[k])
        assert o.shape == r.shape
        rel = np.linalg.norm(o - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 0.1, (k, rel)
    # the serving-relevant invariant: top-query class agreement
    agree = float(np.mean(
        np.asarray(ref["class_logits"]).argmax(-1)
        == np.asarray(out["class_logits"]).argmax(-1)
    ))
    assert agree >= 0.9, agree


def test_streaming_detector_int8_option():
    from arsvt_tpu.evaluation.classify import StreamingDetector

    cfg, params, images = _detector_fixture()
    fp = StreamingDetector(params, cfg, normalize_inputs=False,
                           conf_threshold=0.0, compute_dtype=jnp.float32)
    q = StreamingDetector(params, cfg, normalize_inputs=False,
                          conf_threshold=0.0, compute_dtype=jnp.float32,
                          quantize="int8")
    r_fp = fp._infer(fp._params, images[0])
    r_q = q._infer(q._params, images[0])
    assert set(r_fp.keys()) == set(r_q.keys())
    assert r_q["boxes"].shape == r_fp["boxes"].shape
    np.testing.assert_allclose(
        np.asarray(r_q["boxes"]), np.asarray(r_fp["boxes"]), atol=0.05
    )
    import pytest

    with pytest.raises(ValueError):
        StreamingDetector(params, cfg, quantize="fp4")


def test_int8_forward_is_jittable():
    cfg, params, images = _classifier_fixture()
    qparams = quantize_image_classifier(params, cfg)
    jitted = jax.jit(
        lambda q, x: apply_image_classifier_int8(q, x, cfg, 6)
    )
    out = jitted(qparams, images)
    assert out.shape == (32, 6)
    assert bool(jnp.all(jnp.isfinite(out)))
