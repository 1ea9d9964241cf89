"""StableHLO serving-artifact export (serving/export.py).

The deployment path the reference lacks (its artifact is a torch.save
pickle reloaded strict=False, evaluation.py:375-391): exported modules
must round-trip through bytes, accept any batch size via the symbolic
batch dim, match the in-process forward exactly, and carry the
checkpoint's preprocessing contract.
"""

import io
import itertools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arsvt_tpu.models.classifier import (
    apply_image_classifier,
    init_image_classifier,
)
from arsvt_tpu.models.detector import init_detector
from arsvt_tpu.models.registry import DETECTOR_PRESETS, get_preset
from arsvt_tpu.serving.export import (
    export_classifier,
    export_detector,
    load_exported,
    save_exported,
)


@pytest.fixture(scope="module")
def classifier():
    cfg = get_preset("vit_test_8_32")
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, 6)
    return cfg, params


def _uint8_images(batch, size, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(batch, size, size, 3), dtype=np.uint8
    )


def test_classifier_export_round_trip_and_symbolic_batch(tmp_path,
                                                         classifier):
    cfg, params = classifier
    exported = export_classifier(
        params, cfg, 6, compute_dtype=jnp.float32, platforms=("cpu",)
    )
    path = str(tmp_path / "clf.stablehlo")
    save_exported(exported, path)
    assert os.path.getsize(path) > 0
    loaded = load_exported(path)

    from arsvt_tpu.core.dtypes import to_unit_float
    from arsvt_tpu.data.augment import normalize

    for batch in (1, 3, 8):  # one export serves every batch size
        images = _uint8_images(batch, cfg.image_size, seed=batch)
        idx, probs = loaded.call(images)
        assert idx.shape == (batch,)
        assert probs.shape == (batch, 6)
        x = normalize(to_unit_float(jnp.asarray(images), jnp.float32))
        ref = jax.nn.softmax(
            apply_image_classifier(params, x, cfg, 6).astype(jnp.float32), -1
        )
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(ref), atol=1e-6
        )
        assert (np.asarray(idx) == np.argmax(np.asarray(ref), -1)).all()


def test_classifier_export_respects_normalize_contract(classifier):
    cfg, params = classifier
    images = _uint8_images(2, cfg.image_size)
    raw = export_classifier(
        params, cfg, 6, compute_dtype=jnp.float32,
        normalize_inputs=False, platforms=("cpu",)
    )
    from arsvt_tpu.core.dtypes import to_unit_float

    _, probs = raw.call(images)
    ref = jax.nn.softmax(
        apply_image_classifier(
            params, to_unit_float(jnp.asarray(images), jnp.float32), cfg, 6
        ).astype(jnp.float32), -1,
    )
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref), atol=1e-6)


def test_classifier_export_int8(classifier):
    cfg, params = classifier
    exported = export_classifier(
        params, cfg, 6, compute_dtype=jnp.float32, quantize="int8",
        platforms=("cpu",)
    )
    loaded = jax.export.deserialize(bytearray(exported.serialize()))
    images = _uint8_images(4, cfg.image_size)
    idx8, probs8 = loaded.call(images)
    fp = export_classifier(
        params, cfg, 6, compute_dtype=jnp.float32, platforms=("cpu",)
    )
    idx, probs = fp.call(images)
    assert float(np.mean(np.asarray(idx8) == np.asarray(idx))) >= 0.75
    with pytest.raises(ValueError):
        export_classifier(params, cfg, 6, quantize="fp4")


def test_detector_export_round_trip(tmp_path):
    dcfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(1), dcfg)
    exported = export_detector(
        params, dcfg, compute_dtype=jnp.float32, conf_threshold=0.0,
        platforms=("cpu",)
    )
    path = str(tmp_path / "det.stablehlo")
    save_exported(exported, path)
    loaded = load_exported(path)
    out = loaded.call(_uint8_images(2, dcfg.backbone.image_size))
    assert sorted(out.keys()) == ["boxes", "labels", "scores", "valid"]
    q = dcfg.head.num_queries
    assert out["boxes"].shape == (2, q, 4)
    assert out["scores"].shape == (2, q)

    # parity with the in-process StreamingDetector on the same image
    from arsvt_tpu.evaluation.classify import StreamingDetector

    sd = StreamingDetector(
        params, dcfg, compute_dtype=jnp.float32, conf_threshold=0.0,
        normalize_inputs=True,
    )
    images = _uint8_images(1, dcfg.backbone.image_size, seed=7)
    ref = sd._infer(sd._params, jnp.asarray(images[0]))
    got = loaded.call(images)
    np.testing.assert_allclose(
        np.asarray(got["boxes"]), np.asarray(ref["boxes"]), atol=1e-5
    )


def test_artifact_engine_classify_parity(tmp_path, classifier):
    """load_artifact_engine introspects the task + input contract and
    matches the in-process StreamingClassifier on the same image."""
    from arsvt_tpu.evaluation.classify import StreamingClassifier
    from arsvt_tpu.serving.artifact import (
        ArtifactClassifier,
        load_artifact_engine,
    )

    cfg, params = classifier
    path = str(tmp_path / "clf.stablehlo")
    save_exported(
        export_classifier(
            params, cfg, 6, compute_dtype=jnp.float32, platforms=("cpu",)
        ),
        path,
    )
    engine = load_artifact_engine(path)
    assert isinstance(engine, ArtifactClassifier)
    assert engine.image_size == cfg.image_size

    img = np.random.default_rng(3).uniform(
        size=(cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    idx, name, probs = engine(img)
    ref = StreamingClassifier(
        params, cfg, 6, compute_dtype=jnp.float32, normalize_inputs=True
    )
    ridx, rname, rprobs = ref(img)
    assert (idx, name) == (ridx, rname)
    # engine round-trips the float letterbox through the artifact's uint8
    # input contract — exact for images decoded from uint8, ~1/255 here
    np.testing.assert_allclose(probs, rprobs, atol=0.02)
    assert engine.latency_stats()["n"] == 1


def test_artifact_engine_detect_and_server(tmp_path):
    """Detect artifact through load_artifact_engine AND the HTTP server's
    --artifact path end-to-end over a real socket."""
    import urllib.request

    from arsvt_tpu.serving.artifact import ArtifactDetector
    from arsvt_tpu.serving.server import InferenceServer

    dcfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(1), dcfg)
    path = str(tmp_path / "det.stablehlo")
    save_exported(
        export_detector(
            params, dcfg, compute_dtype=jnp.float32, conf_threshold=0.0,
            platforms=("cpu",)
        ),
        path,
    )
    srv = InferenceServer.from_artifact(path)
    assert isinstance(srv._det, ArtifactDetector)
    host, port = srv.start_background(port=0)
    try:
        from PIL import Image

        buf = io.BytesIO()
        size = dcfg.backbone.image_size
        Image.fromarray(_uint8_images(1, size)[0]).save(buf, format="JPEG")
        req = urllib.request.Request(
            f"http://{host}:{port}/detect", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert set(out) == {"boxes", "labels", "scores", "class_names"}
        assert len(out["boxes"]) == len(out["scores"])
        with urllib.request.urlopen(
            f"http://{host}:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["endpoints"] == ["/detect"]
    finally:
        srv.shutdown()


def test_export_checkpoint_end_to_end(tmp_path):
    """Train 2 steps → orbax checkpoint → export_checkpoint → artifact
    serves with the architecture + contract read from the checkpoint."""
    from arsvt_tpu.data.synthetic import synthetic_classification_batches
    from arsvt_tpu.parallel.mesh import MeshConfig, make_mesh
    from arsvt_tpu.serving.export import export_checkpoint
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.trainer import Trainer

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=2, checkpoint_every=2, eval_every=10**9, log_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    tr = Trainer(cfg, mesh=make_mesh(MeshConfig(), platform="cpu"))
    tr.init_state()
    tr.fit(itertools.islice(
        synthetic_classification_batches(
            batch_size=cfg.batch_size, image_size=32, seed=0
        ), 2,
    ))

    out = str(tmp_path / "model.stablehlo")
    manifest = export_checkpoint(
        str(tmp_path / "ckpt"), out, platforms=("cpu",)
    )
    assert manifest["task"] == "classify"
    assert manifest["image_size"] == 32
    assert os.path.exists(out)
    json.dumps(manifest)  # manifest is JSON-serializable

    loaded = load_exported(out)
    idx, probs = loaded.call(_uint8_images(2, 32))
    assert probs.shape == (2, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_artifact_engine_rejects_normalized_floats(tmp_path, classifier):
    """The streaming double-normalization guard carries over to artifact
    engines (review finding): out-of-range floats raise instead of being
    silently mangled by the uint8 input round-trip."""
    from arsvt_tpu.serving.artifact import load_artifact_engine

    cfg, params = classifier
    path = str(tmp_path / "clf.stablehlo")
    save_exported(
        export_classifier(
            params, cfg, 6, compute_dtype=jnp.float32, platforms=("cpu",)
        ),
        path,
    )
    engine = load_artifact_engine(path)
    bad = np.random.default_rng(0).normal(
        0.0, 2.0, (cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    with pytest.raises(ValueError, match="already normalized"):
        engine(bad)


def test_export_checkpoint_rejects_thresholds_for_classify(tmp_path):
    from arsvt_tpu.serving.export import export_checkpoint
    from arsvt_tpu.data.synthetic import synthetic_classification_batches
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.trainer import Trainer

    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=2, checkpoint_every=2, eval_every=10**9, log_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    tr = Trainer(cfg)
    tr.fit(itertools.islice(
        synthetic_classification_batches(
            batch_size=cfg.batch_size, image_size=32, seed=0
        ), 2,
    ))
    with pytest.raises(ValueError, match="detect checkpoints"):
        export_checkpoint(
            str(tmp_path / "ckpt"), str(tmp_path / "m.hlo"),
            conf_threshold=0.9, platforms=("cpu",),
        )


def test_artifact_micro_batched_server(tmp_path, classifier):
    """from_artifact(max_batch=N): the artifact engine's padded batched
    forward serves concurrent requests with identical results."""
    import concurrent.futures
    import urllib.request

    from PIL import Image

    from arsvt_tpu.serving.server import InferenceServer

    cfg, params = classifier
    path = str(tmp_path / "clf.stablehlo")
    save_exported(
        export_classifier(
            params, cfg, 6, compute_dtype=jnp.float32, platforms=("cpu",)
        ),
        path,
    )
    srv = InferenceServer.from_artifact(
        path, max_batch=4, batch_window_ms=50.0
    )
    host, port = srv.start_background(port=0)
    try:
        buf = io.BytesIO()
        Image.fromarray(_uint8_images(1, cfg.image_size)[0]).save(
            buf, format="JPEG"
        )
        body = buf.getvalue()

        def post(_):
            req = urllib.request.Request(
                f"http://{host}:{port}/classify", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(max_workers=6) as ex:
            results = list(ex.map(post, range(6)))
        assert len({r["class"] for r in results}) == 1
        assert all(len(r["probs"]) == 6 for r in results)
    finally:
        srv.shutdown()


def test_detector_export_int8_round_trip(tmp_path):
    """int8-quantized DETECT artifact: serializes, round-trips, and stays
    box-consistent with the fp export on the same image (fp head keeps
    regression quality; backbone quantization shifts logits slightly)."""
    dcfg = DETECTOR_PRESETS["detector_test"]
    params = init_detector(jax.random.PRNGKey(2), dcfg)
    images = _uint8_images(2, dcfg.backbone.image_size, seed=11)

    fp = export_detector(
        params, dcfg, compute_dtype=jnp.float32, conf_threshold=0.0,
        platforms=("cpu",)
    )
    q = export_detector(
        params, dcfg, compute_dtype=jnp.float32, conf_threshold=0.0,
        quantize="int8", platforms=("cpu",)
    )
    path = str(tmp_path / "det8.stablehlo")
    save_exported(q, path)
    out8 = load_exported(path).call(images)
    out = fp.call(images)
    assert sorted(out8.keys()) == ["boxes", "labels", "scores", "valid"]
    # same shapes, finite boxes, and the quantized boxes stay close to fp
    # (per-output-channel W8A8 backbone, fp DETR head)
    assert out8["boxes"].shape == out["boxes"].shape
    assert np.isfinite(np.asarray(out8["boxes"])).all()
    np.testing.assert_allclose(
        np.asarray(out8["boxes"]), np.asarray(out["boxes"]), atol=0.15
    )
