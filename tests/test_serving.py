"""Serving: HTTP classify/detect endpoints end-to-end over a real socket."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
from PIL import Image

from arsvt_tpu.evaluation.classify import StreamingClassifier, StreamingDetector
from arsvt_tpu.models.classifier import init_image_classifier
from arsvt_tpu.models.detector import init_detector
from arsvt_tpu.models.registry import DETECTOR_PRESETS, get_preset
from arsvt_tpu.serving.server import InferenceServer


def _jpeg_bytes(size=32):
    img = Image.fromarray(
        (np.random.default_rng(0).uniform(size=(size, size, 3)) * 255)
        .astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    import jax.numpy as jnp

    cfg = get_preset("vit_test_8_32")
    clf = StreamingClassifier(
        init_image_classifier(jax.random.PRNGKey(0), cfg, 6), cfg, 6,
        compute_dtype=jnp.float32,
    )
    dcfg = DETECTOR_PRESETS["detector_test"]
    det = StreamingDetector(
        init_detector(jax.random.PRNGKey(0), dcfg), dcfg,
        compute_dtype=jnp.float32, conf_threshold=0.01,
    )
    srv = InferenceServer(classifier=clf, detector=det)
    host, port = srv.start_background(port=0)
    yield f"http://{host}:{port}"
    srv.shutdown()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"
    assert "/classify" in data["endpoints"]
    assert "/detect" in data["endpoints"]


def test_classify_endpoint(server):
    status, data = _post(server + "/classify", _jpeg_bytes())
    assert status == 200
    assert data["class_name"] in (
        "glass", "paper", "cardboard", "plastic", "metal", "trash"
    )
    assert abs(sum(data["probs"]) - 1.0) < 1e-3
    assert data["latency_ms"] > 0


def test_detect_endpoint(server):
    status, data = _post(server + "/detect", _jpeg_bytes())
    assert status == 200
    assert len(data["boxes"]) == len(data["scores"]) == len(data["labels"])


def test_bad_payload_is_400(server):
    status = None
    try:
        status, _ = _post(server + "/classify", b"this is not an image")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_stats_after_requests(server):
    with urllib.request.urlopen(server + "/stats", timeout=30) as r:
        data = json.loads(r.read())
    assert data["classify"]["n"] >= 1


def test_streaming_preprocessing_contract():
    """uint8 frames rescale on device, and normalize_inputs matches the
    augment!="none" training contract (normalized vs raw inputs give
    different logits; uint8 vs its [0,1]-float twin give identical ones)."""
    import jax.numpy as jnp

    cfg = get_preset("vit_test_8_32")
    params = init_image_classifier(jax.random.PRNGKey(1), cfg, 6)
    # the classifier head is zero-init (logits identically 0 at init, so
    # softmax probs cannot distinguish inputs) — randomize it for the test
    params["classifier"] = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape, x.dtype),
        params["classifier"],
    )
    u8 = (np.random.default_rng(3).uniform(size=(32, 32, 3)) * 255).astype(
        np.uint8
    )
    f32 = u8.astype(np.float32) / 255.0

    norm = StreamingClassifier(params, cfg, 6, compute_dtype=jnp.float32)
    raw = StreamingClassifier(params, cfg, 6, compute_dtype=jnp.float32,
                              normalize_inputs=False)
    _, _, p_u8 = norm(u8)
    _, _, p_f32 = norm(f32)
    np.testing.assert_allclose(p_u8, p_f32, atol=1e-6)
    _, _, p_raw = raw(f32)
    assert not np.allclose(p_u8, p_raw)


def test_infer_batch_matches_single():
    """StreamingClassifier.infer_batch == N single calls (the micro-batch
    contract: padding rows must not change real rows' outputs)."""
    import jax.numpy as jnp

    from arsvt_tpu.models.registry import get_preset

    cfg = get_preset("vit_test_8_32")
    clf = StreamingClassifier(
        init_image_classifier(jax.random.PRNGKey(3), cfg, 6), cfg, 6,
        compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(5, 32, 32, 3)).astype(np.float32)
    idx_b, probs_b = clf.infer_batch(images)
    for i in range(5):
        idx_s, _, probs_s = clf(images[i])
        assert idx_b[i] == idx_s
        np.testing.assert_allclose(probs_b[i], probs_s, atol=1e-5)


def test_micro_batching_server_end_to_end():
    """Concurrent /classify requests against a max_batch server: all
    answers correct-shaped, and the batcher actually coalesced (stats
    report at least one multi-request batch) while /stats exposes it."""
    import concurrent.futures
    import json as _json
    import urllib.request

    import jax.numpy as jnp

    from arsvt_tpu.models.registry import get_preset
    from arsvt_tpu.serving.server import InferenceServer

    cfg = get_preset("vit_test_8_32")
    clf = StreamingClassifier(
        init_image_classifier(jax.random.PRNGKey(4), cfg, 6), cfg, 6,
        compute_dtype=jnp.float32,
    )
    srv = InferenceServer(classifier=clf, max_batch=4, batch_window_ms=50.0)
    host, port = srv.start_background(port=0)
    try:
        body = _jpeg_bytes(32)

        def post(_):
            req = urllib.request.Request(
                f"http://{host}:{port}/classify", data=body, method="POST"
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return _json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(post, range(8)))
        assert all(len(r["probs"]) == 6 for r in results)
        # same JPEG -> identical prediction regardless of batch slot
        assert len({r["class"] for r in results}) == 1

        with urllib.request.urlopen(
            f"http://{host}:{port}/stats", timeout=30
        ) as r:
            stats = _json.loads(r.read())
        b = stats["batching"]
        assert b["requests"] == 8
        assert b["batches"] < 8  # coalescing actually happened
        assert b["max_batch_seen"] >= 2
    finally:
        srv.shutdown()


def test_micro_batching_rejects_detect_only():
    from arsvt_tpu.serving.server import InferenceServer
    import jax.numpy as jnp

    dcfg = DETECTOR_PRESETS["detector_test"]
    det = StreamingDetector(
        init_detector(jax.random.PRNGKey(0), dcfg), dcfg,
        compute_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="needs a classifier"):
        InferenceServer(detector=det, max_batch=4)


def test_micro_batcher_error_propagation_and_padding():
    """An engine failure reaches every waiter as the raised error; padded
    rows never leak into results."""
    from arsvt_tpu.serving.batching import MicroBatcher

    calls = []

    def infer_batch(images):
        calls.append(images.shape[0])
        if len(calls) == 1:
            raise RuntimeError("boom")
        # identity-ish: every padded call arrives at the fixed max shape
        assert images.shape[0] == 4
        return (np.arange(images.shape[0]) % 6,
                np.tile(np.eye(6)[0], (images.shape[0], 1)))

    b = MicroBatcher(infer_batch, max_batch=4, window_ms=1.0)
    try:
        img = np.zeros((8, 8, 3), np.float32)
        with pytest.raises(RuntimeError, match="boom"):
            b.infer(img)
        idx, probs = b.infer(img)  # batcher survives the failure
        assert probs.shape == (6,)
        assert calls and calls[-1] == 4  # padded to the one compiled shape
    finally:
        b.shutdown()


def test_server_cli_flag_validation(tmp_path):
    """server CLI rejects contradictory flag combinations loudly."""
    from arsvt_tpu.serving.server import main as server_main

    with pytest.raises(SystemExit):
        server_main(["--artifact", "x.hlo", "--int8"])
    with pytest.raises(SystemExit):
        server_main(["--artifact", "x.hlo", "--step", "3"])
    with pytest.raises(SystemExit):  # mutually exclusive sources
        server_main(["--artifact", "x.hlo", "--checkpoint-dir", "d"])
    with pytest.raises(SystemExit):  # one source required
        server_main([])


def test_micro_batcher_shutdown_race_never_hangs():
    """A request whose enqueue lands AFTER shutdown's final drain must be
    failed, not stranded: infer() re-checks the stop flag after its put and
    self-drains. Reproduced deterministically by running a full shutdown
    from inside the queue's put (i.e. between infer's liveness check and
    the enqueue landing)."""
    from arsvt_tpu.serving.batching import MicroBatcher

    def infer_batch(images):
        return (np.zeros(images.shape[0], np.int64),
                np.tile(np.eye(6)[0], (images.shape[0], 1)))

    b = MicroBatcher(infer_batch, max_batch=2, window_ms=1.0)

    class RacingQueue:
        """First put triggers a complete shutdown (stop flag + worker join
        + final drain), THEN lands the item — the lost-waiter interleaving."""

        def __init__(self, inner):
            self._inner = inner
            self._raced = False

        def put(self, item, *a, **k):
            if not self._raced and item is not None:
                self._raced = True
                shutdown()
            self._inner.put(item, *a, **k)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real_q = b._q
    shutdown = b.shutdown
    b._q = RacingQueue(real_q)

    done = {}

    def request():
        try:
            b.infer(np.zeros((4, 4, 3), np.float32))
        except RuntimeError as e:
            done["error"] = str(e)

    t = threading.Thread(target=request, daemon=True)
    t.start()
    t.join(timeout=10)
    assert not t.is_alive(), "infer() hung on a dead worker"
    assert "shut down" in done.get("error", "")


def test_portable_export_guard_forces_jnp_path(monkeypatch):
    """Exporting for any non-TPU platform must trace the pure-jnp ops:
    Pallas Mosaic custom calls cannot lower for CPU, so an export from a
    TPU host (use_pallas() True) with platforms=("tpu","cpu") — the
    documented edge-deployment recipe — would otherwise fail."""
    from arsvt_tpu.ops.dispatch import use_pallas
    from arsvt_tpu.serving.export import _portable_trace_guard

    monkeypatch.delenv("ARSVT_DISABLE_PALLAS", raising=False)
    monkeypatch.setenv("ARSVT_FORCE_PALLAS", "1")  # simulate a TPU host
    assert use_pallas()
    with _portable_trace_guard(("tpu", "cpu")):
        assert not use_pallas()
    assert use_pallas()  # restored (FORCE_PALLAS put back)
    with _portable_trace_guard(("cpu",)):
        assert not use_pallas()
    with _portable_trace_guard(("tpu",)):
        assert use_pallas()  # TPU-only artifacts keep the kernels
    with _portable_trace_guard(None):
        assert use_pallas()


def test_inference_bundle_loads_on_any_host_mesh(tmp_path):
    """Serving must not rebuild the TRAINING mesh from the saved config: a
    checkpoint trained with mesh_data=5 (or 8) has to serve on a 1-chip
    box. load_inference_bundle is host-local and params-only."""
    from arsvt_tpu.data.synthetic import synthetic_classification_batches
    from arsvt_tpu.parallel.mesh import single_device_mesh
    from arsvt_tpu.serving.loading import load_inference_bundle
    from arsvt_tpu.train.config import TRAIN_PRESETS
    from arsvt_tpu.train.trainer import Trainer

    # cfg CLAIMS a 5-way data mesh (indivisible over this host's devices —
    # rebuilding it would raise); train on an explicit 1x1 mesh instead
    cfg = TRAIN_PRESETS["smoke"].with_overrides(
        total_steps=2, checkpoint_every=2, eval_every=10**9,
        log_every=10**9, checkpoint_dir=str(tmp_path / "ck"),
        mesh_data=5, batch_size=5,
    )
    tr = Trainer(cfg, mesh=single_device_mesh(platform="cpu"))
    tr.fit(synthetic_classification_batches(
        batch_size=cfg.batch_size, image_size=32, seed=0))

    params, loaded_cfg = load_inference_bundle(str(tmp_path / "ck"))
    assert loaded_cfg.mesh_data == 5  # config round-trips untouched
    assert "classifier" in params  # restored without a training mesh
