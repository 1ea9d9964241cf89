"""On-device Hungarian matcher share of the detector step (VERDICT #9).

Times the jitted cost-build + Jonker-Volgenant assignment at the reference
detector's exact shapes (batch 32, Q=5 queries, M=25 padded targets -> 25x25
rectangular JV LAP), including the deep-supervision case (7 matchings per step:
final + 6 aux decoder layers, vmapped). Prints one JSON line.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arsvt_tpu.objectives.matcher import MatcherConfig, match

B, Q, M, C, L = 32, 5, 25, 6, 7


def timeit(fn, *args, steps=30):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, Q, C + 1)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (B, Q, 4)), jnp.float32)
    tl = jnp.asarray(rng.integers(0, C, (B, M)), jnp.int32)
    tb = jnp.asarray(
        np.sort(rng.uniform(0, 1, (B, M, 2, 2)), axis=2).reshape(B, M, 4),
        jnp.float32,
    )
    tm = jnp.asarray(np.arange(M)[None] < rng.integers(1, 8, (B, 1)))

    cfg = MatcherConfig()
    one = jax.jit(lambda *a: match(*a, cfg))
    t1 = timeit(one, logits, boxes, tl, tb, tm)

    # deep supervision: L independent matchings, vmapped over the layer axis
    logits_l = jnp.broadcast_to(logits, (L,) + logits.shape)
    boxes_l = jnp.broadcast_to(boxes, (L,) + boxes.shape)
    seven = jax.jit(jax.vmap(lambda cl, bx: match(cl, bx, tl, tb, tm, cfg)))
    t7 = timeit(seven, logits_l, boxes_l)

    print(f"matcher x1: {t1:.2f} ms; x{L} (vmapped aux): {t7:.2f} ms",
          file=sys.stderr)
    print(json.dumps({
        "matcher_x1_ms": round(t1, 2),
        f"matcher_x{L}_ms": round(t7, 2),
        "shapes": f"B={B} Q={Q} M={M} -> {max(Q, M)}x{max(Q, M)} LAP",
    }))


if __name__ == "__main__":
    main()
