"""HTTP inference server for the physical sorter loop.

The reference has no serving story at all (its eval script batch-processes
a directory); BASELINE.json's config #5 asks for a "streaming sorter loop:
JPEG decode→preprocess→classify single-image pipeline". This wraps the
streaming paths in a stdlib HTTP server (no extra dependencies):

    POST /classify   body = JPEG/PNG bytes -> {"class", "class_name",
                     "probs", "latency_ms"}
    POST /detect     body = JPEG/PNG bytes -> {"boxes", "labels",
                     "scores", "class_names"}
    GET  /healthz    -> {"status": "ok", "backend": ...}
    GET  /stats      -> rolling latency percentiles

Single worker thread drives the TPU (requests serialize; the model forward
is ~ms, so throughput is bounded by decode + HTTP, not the chip). Start:

    server = InferenceServer.from_checkpoint("checkpoints")
    server.serve(port=8000)          # blocking
    server.start_background()        # or threaded
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np


class InferenceServer:
    def __init__(self, *, classifier=None, detector=None,
                 max_batch: int = 1, batch_window_ms: float = 3.0):
        """Pass a StreamingClassifier and/or StreamingDetector.

        `max_batch > 1` turns on dynamic micro-batching for /classify:
        concurrent requests within `batch_window_ms` share one padded
        device forward (serving/batching.py)."""
        if classifier is None and detector is None:
            raise ValueError("need a classifier and/or a detector")
        if max_batch < 1:
            raise ValueError(
                f"max_batch must be >= 1 (1 = unbatched), got {max_batch}"
            )
        self._clf = classifier
        self._det = detector
        self._lock = threading.Lock()  # serialize device access
        self._httpd = None
        self._batcher = None
        if max_batch > 1:
            if classifier is None:
                raise ValueError("max_batch > 1 needs a classifier "
                                 "(/detect stays single-image)")
            from arsvt_tpu.serving.batching import MicroBatcher

            self._batcher = MicroBatcher(
                classifier.infer_batch, max_batch=max_batch,
                window_ms=batch_window_ms, lock=self._lock,
            )
            # warm the ONE padded batch shape now — otherwise the first
            # real request stalls behind the full XLA compile while the
            # batcher worker holds the device lock
            s = classifier.image_size
            classifier.infer_batch(
                np.zeros((max_batch, s, s, 3), np.float32)
            )

    # ------------------------------------------------------------ factory
    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, *, step: int | None = None,
                        quantize: str | None = None,
                        max_batch: int = 1, batch_window_ms: float = 3.0):
        """Build the right streaming engine from a training checkpoint.

        `quantize="int8"` serves the W8A8 backbone — int8 MXU matmuls,
        4x smaller weights in device memory (models/quantized.py). For
        detect checkpoints the DETR head stays fp (box regression is the
        quantization-sensitive output; the head is ~0 of the compute)."""
        from arsvt_tpu.serving.loading import load_inference_bundle

        params, cfg = load_inference_bundle(checkpoint_dir, step=step)

        # preprocessing contract rides with the checkpoint: training with
        # augment="none" feeds raw [0,1] images, every other mode ImageNet-
        # normalizes inside the step — serving must match or every response
        # is computed on a wrongly-scaled input
        normalize_inputs = cfg.augment != "none"
        if cfg.task == "detect":
            from arsvt_tpu.evaluation.classify import StreamingDetector
            from arsvt_tpu.train.config import resolve_detector

            if max_batch > 1:
                raise ValueError("micro-batching applies to /classify; "
                                 "detect checkpoints serve single-image")
            return cls(detector=StreamingDetector(
                params, resolve_detector(cfg),
                normalize_inputs=normalize_inputs, quantize=quantize,
            ))
        from arsvt_tpu.evaluation.classify import StreamingClassifier
        from arsvt_tpu.train.config import resolve_backbone

        return cls(classifier=StreamingClassifier(
            params, resolve_backbone(cfg), cfg.num_classes,
            normalize_inputs=normalize_inputs, quantize=quantize,
        ), max_batch=max_batch, batch_window_ms=batch_window_ms)

    @classmethod
    def from_artifact(cls, artifact_path: str, *, max_batch: int = 1,
                      batch_window_ms: float = 3.0):
        """Serve a StableHLO export artifact (serving/export.py) — no
        model code, training config, or orbax on the serving box; the
        task and preprocessing contract live inside the artifact."""
        from arsvt_tpu.serving.artifact import (
            ArtifactDetector,
            load_artifact_engine,
        )

        engine = load_artifact_engine(artifact_path)
        if isinstance(engine, ArtifactDetector):
            if max_batch > 1:
                raise ValueError("micro-batching applies to /classify; "
                                 "detect artifacts serve single-image")
            return cls(detector=engine)
        return cls(classifier=engine, max_batch=max_batch,
                   batch_window_ms=batch_window_ms)

    # ----------------------------------------------------------- handlers
    def _decode(self, body: bytes):
        from PIL import Image, ImageOps

        # EXIF orientation must be applied here exactly like training/eval
        # decode paths do (data/pipeline.py::_open_upright) — a camera
        # frame stored rotated-with-tag would otherwise classify sideways
        # while the same frame via /detect (path-based decode) is upright
        img = ImageOps.exif_transpose(Image.open(io.BytesIO(body)))
        return np.asarray(img.convert("RGB"), np.float32) / 255.0

    def _classify(self, body: bytes) -> dict:
        from arsvt_tpu.data.pipeline import letterbox
        import jax.numpy as jnp
        import time

        t0 = time.perf_counter()
        # rescale + normalization happen inside the classifier's jitted
        # forward, per its normalize_inputs contract
        img, _ = letterbox(self._decode(body), self._clf.image_size)
        if self._batcher is not None:
            # decode/letterbox ran on this request thread (parallel);
            # the batcher coalesces concurrent forwards into one device
            # call and serializes against /detect via the shared lock
            idx, probs = self._batcher.infer(img)
            self._clf.note_latency(time.perf_counter() - t0)
            from arsvt_tpu.data.taxonomy import class_name

            name = class_name(idx)
        else:
            with self._lock:
                idx, name, probs = self._clf(jnp.asarray(img))
            # /stats must mean the same thing in both modes: the batched
            # path records decode+letterbox+forward via note_latency, so
            # overwrite the engine's forward-only sample with the same
            # decode-inclusive measurement
            self._clf.replace_last_latency(time.perf_counter() - t0)
        return {
            "class": int(idx),
            "class_name": name,
            "probs": [round(float(p), 4) for p in probs],
            "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
        }

    def _detect(self, body: bytes) -> dict:
        import tempfile
        import os

        # StreamingDetector's public surface is path-based (sorter cameras
        # write frames); spool the upload
        with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
            f.write(body)
            path = f.name
        try:
            with self._lock:
                out = self._det.detect_path(path)
        finally:
            os.unlink(path)
        return {
            "boxes": np.asarray(out["boxes"]).round(4).tolist(),
            "labels": np.asarray(out["labels"]).tolist(),
            "scores": np.asarray(out["scores"]).round(4).tolist(),
            "class_names": out["class_names"],
        }

    def _stats(self) -> dict:
        stats = {}
        if self._clf is not None:
            stats["classify"] = self._clf.latency_stats()
        if self._det is not None:
            stats["detect"] = self._det.latency_stats()
        if self._batcher is not None:
            stats["batching"] = self._batcher.stats()
        return stats

    # -------------------------------------------------------------- serve
    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "endpoints": [
                            p for p, ok in (
                                ("/classify", server_self._clf),
                                ("/detect", server_self._det),
                            ) if ok is not None
                        ],
                    })
                elif self.path == "/stats":
                    self._send(200, server_self._stats())
                else:
                    self._send(404, {"error": "unknown path"})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                try:
                    if self.path == "/classify" and server_self._clf:
                        self._send(200, server_self._classify(body))
                    elif self.path == "/detect" and server_self._det:
                        self._send(200, server_self._detect(body))
                    else:
                        self._send(404, {"error": "unknown path"})
                except (BrokenPipeError, ConnectionError):
                    # the client went away mid-write — a 400 on the same
                    # stream would follow an already-sent 200 status line
                    pass
                except Exception as e:  # undecodable image etc.
                    try:
                        self._send(400, {"error": str(e)[:200]})
                    except (BrokenPipeError, ConnectionError):
                        pass

        return Handler

    def serve(self, *, host: str = "127.0.0.1", port: int = 8000):
        self._httpd = ThreadingHTTPServer(
            (host, port), self._make_handler()
        )
        self._httpd.serve_forever()

    def start_background(self, *, host: str = "127.0.0.1", port: int = 8000):
        self._httpd = ThreadingHTTPServer(
            (host, port), self._make_handler()
        )
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()  # free the listening socket fd now
            self._httpd = None
        if self._batcher is not None:
            self._batcher.shutdown()
            self._batcher = None


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="arsvt_tpu inference server")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint-dir",
                     help="serve from an orbax training checkpoint")
    src.add_argument("--artifact",
                     help="serve a StableHLO export artifact "
                          "(python -m arsvt_tpu.serving.export)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=1,
                   help="dynamic micro-batching for /classify: coalesce "
                        "up to N concurrent requests into one forward")
    p.add_argument("--batch-window-ms", type=float, default=3.0,
                   help="how long a lone request waits for batch company")
    p.add_argument("--int8", action="store_true",
                   help="serve the W8A8 quantized backbone (classify and "
                        "detect; int8 MXU matmuls, 4x smaller weights); "
                        "with --artifact, quantization is baked at export "
                        "time instead")
    args = p.parse_args(argv)
    if args.artifact:
        if args.int8 or args.step is not None:
            p.error("--int8/--step apply to --checkpoint-dir; with "
                    "--artifact they are baked in at export time")
        server = InferenceServer.from_artifact(
            args.artifact, max_batch=args.max_batch,
            batch_window_ms=args.batch_window_ms,
        )
    else:
        server = InferenceServer.from_checkpoint(
            args.checkpoint_dir, step=args.step,
            quantize="int8" if args.int8 else None,
            max_batch=args.max_batch,
            batch_window_ms=args.batch_window_ms,
        )
    print(f"serving on http://{args.host}:{args.port}  "
          f"(POST /classify|/detect, GET /healthz|/stats)")
    server.serve(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
