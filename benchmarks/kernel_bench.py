"""Kernel microbenchmarks: Pallas vs XLA lowering, fwd and fwd+bwd.

Run on the TPU host: `python benchmarks/kernel_bench.py [--shape vitb]`.
NOTE (axon tunnel): sync via float()/item(), never block_until_ready.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SHAPES = {
    "vitb": dict(b=256, s=197, h=12, hd=64, d=768, m=3072),
    "vitl": dict(b=64, s=577, h=16, hd=64, d=1024, m=4096),
    "deit_ref": dict(b=64, s=198, h=25, hd=16, d=400, m=1600),
}


def timeit(fn, arg, n=20, label=""):
    out = fn(arg)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt * 1e3:.2f} ms")
    return dt


def bench_attention(cfg):
    from arsvt_tpu.ops.attention import sdpa_reference
    from arsvt_tpu.ops.pallas.flash_attention import flash_attention

    b, s, h, hd = cfg["b"], cfg["s"], cfg["h"], cfg["hd"]
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, h, s, hd), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, hd),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, hd),
                          jnp.bfloat16)
    for name, fn in [("flash", flash_attention), ("xla", sdpa_reference)]:
        timeit(jax.jit(lambda qq, fn=fn: fn(qq, k, v)), q,
               label=f"attention/{name} fwd")
        timeit(
            jax.jit(jax.grad(
                lambda qq, fn=fn: jnp.sum(
                    fn(qq, k, v).astype(jnp.float32) ** 2
                )
            )),
            q, label=f"attention/{name} fwd+bwd(dq)",
        )


def bench_mlp(cfg):
    from arsvt_tpu.ops.mlp import gelu_mlp
    from arsvt_tpu.ops.pallas.fused_mlp import fused_gelu_mlp

    n, d, m = cfg["b"] * cfg["s"], cfg["d"], cfg["m"]
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (n, d), jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.fold_in(key, 1), (d, m)) * 0.05
          ).astype(jnp.bfloat16)
    b1 = jnp.zeros((m,))
    w2 = (jax.random.normal(jax.random.fold_in(key, 2), (m, d)) * 0.05
          ).astype(jnp.bfloat16)
    b2 = jnp.zeros((d,))
    for name, fn in [
        ("pallas", fused_gelu_mlp),
        ("xla", lambda *a: gelu_mlp(*a, force_reference=True)),
    ]:
        timeit(jax.jit(lambda xx, fn=fn: fn(xx, w1, b1, w2, b2)), x,
               label=f"mlp/{name} fwd")
        timeit(
            jax.jit(jax.grad(
                lambda xx, fn=fn: jnp.sum(
                    fn(xx, w1, b1, w2, b2).astype(jnp.float32) ** 2
                )
            )),
            x, label=f"mlp/{name} fwd+bwd(dx)",
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="vitb", choices=sorted(SHAPES))
    args = p.parse_args()
    cfg = SHAPES[args.shape]
    print(f"backend={jax.default_backend()} shape={args.shape}: {cfg}")
    bench_attention(cfg)
    bench_mlp(cfg)
