"""Serving load test: N concurrent clients against the HTTP server
(VERDICT round-3 #7 — sustained load on the MicroBatcher, not a 2-client
smoke).

Spins up InferenceServer (dynamic micro-batching on) over a
fresh-initialized classifier of --preset, hammers POST /classify from
--clients closed-loop threads for --duration seconds with a real JPEG
body, and prints ONE JSON line: QPS, latency percentiles, error count,
and the batcher's coalescing stats (avg batch actually formed under
load — the number that tells you the batching is real).

Throughput note: on this 1-core dev host the server-side JPEG decode and
the client threads share the core with the device dispatch, so CPU runs
measure the machinery; the deployable numbers come from a TPU run
(benchmarks/tpu_revalidate.sh step 4).

Run: python benchmarks/serving_load.py [--clients 16] [--duration 20]
     [--max-batch 8] [--preset vit_base_16_224] [--quantize int8]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _jpeg_frame(side_w=640, side_h=480, quality=90) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(7)
    buf = io.BytesIO()
    Image.fromarray(
        (rng.uniform(size=(side_h, side_w, 3)) * 255).astype(np.uint8)
    ).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _client_loop(port: int, body: bytes, stop: threading.Event,
                 latencies: list, errors: list):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    while not stop.is_set():
        t0 = time.perf_counter()
        try:
            conn.request("POST", "/classify", body,
                         {"Content-Type": "image/jpeg"})
            resp = conn.getresponse()
            payload = resp.read()
            if resp.status != 200:
                errors.append(payload[:200])
                continue
        except Exception as e:  # noqa: BLE001 - record and reconnect
            errors.append(repr(e)[:200])
            conn.close()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            continue
        latencies.append(time.perf_counter() - t0)
    conn.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--batch-window-ms", type=float, default=3.0)
    ap.add_argument("--preset", default="vit_base_16_224")
    ap.add_argument("--quantize", default=None, choices=[None, "int8"])
    ap.add_argument("--port", type=int, default=18123)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from arsvt_tpu.evaluation.classify import StreamingClassifier
    from arsvt_tpu.models.classifier import init_image_classifier
    from arsvt_tpu.models.registry import get_preset
    from arsvt_tpu.serving.server import InferenceServer

    cfg = get_preset(args.preset)
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, 6)
    clf = StreamingClassifier(params, cfg, 6, quantize=args.quantize)
    server = InferenceServer(
        classifier=clf, max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
    )
    server.start_background(port=args.port)
    log(f"server up on :{args.port} (backend {jax.default_backend()}, "
        f"max_batch {args.max_batch}, window {args.batch_window_ms}ms)")

    body = _jpeg_frame()
    # warm: decode path + the padded batch shape are compiled by __init__;
    # a few sequential requests settle the HTTP layer
    conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=120)
    for _ in range(3):
        conn.request("POST", "/classify", body,
                     {"Content-Type": "image/jpeg"})
        conn.getresponse().read()
    conn.close()

    stop = threading.Event()
    latencies: list[float] = []
    errors: list = []
    threads = [
        threading.Thread(
            target=_client_loop,
            args=(args.port, body, stop, latencies, errors), daemon=True,
        )
        for _ in range(args.clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.duration)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    wall = time.perf_counter() - t0

    # server-side coalescing stats AFTER the run
    conn = http.client.HTTPConnection("127.0.0.1", args.port, timeout=60)
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    conn.close()
    server.shutdown()

    lat = np.asarray(sorted(latencies)) * 1e3
    result = {
        "clients": args.clients,
        "duration_s": round(wall, 1),
        "requests_ok": int(lat.size),
        "errors": len(errors),
        "qps": round(lat.size / wall, 1),
        "p50_ms": round(float(np.percentile(lat, 50)), 2) if lat.size else None,
        "p90_ms": round(float(np.percentile(lat, 90)), 2) if lat.size else None,
        "p99_ms": round(float(np.percentile(lat, 99)), 2) if lat.size else None,
        "max_batch": args.max_batch,
        "batch_window_ms": args.batch_window_ms,
        "batcher": stats.get("batching"),
        "preset": args.preset,
        "quantize": args.quantize,
        "backend": __import__("jax").default_backend(),
    }
    if errors:
        log(f"first error: {errors[0]}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
