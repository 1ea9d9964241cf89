"""A/B: transpose-based packed attention VJP vs direct-layout fused block.

Path A (round-2 champion): qkv matmul -> flash_self_attention_packed
(computes (B,H,S,d) transposes, saves only qkv_flat/out/lse) -> out proj.

Path B: fused_encoder_attention — one custom VJP over the whole
qkv-proj -> attention -> out-proj block whose Pallas kernels read per-head
column blocks straight out of the (B,S,3D) projection output (strided DMA,
zero transposes, no (B,S,3D) cotangent materialised).

Run on the TPU chip: python benchmarks/attn_layout_bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, S, D, H = 256, 197, 768, 12


def build():
    r = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(r.normal(size=s, scale=0.02), jnp.bfloat16)
    return f(B, S, D), f(D, 3 * D), f(3 * D), f(D, D), f(D)


def path_a(y, wqkv, bqkv, wproj, bproj):
    from arsvt_tpu.ops.pallas.flash_attention import (
        flash_self_attention_packed,
    )

    qkv = jnp.dot(y, wqkv) + bqkv
    attn = flash_self_attention_packed(qkv, H)
    return jnp.dot(attn, wproj) + bproj


def path_b(y, wqkv, bqkv, wproj, bproj):
    from arsvt_tpu.ops.pallas.flash_attention import fused_encoder_attention

    return fused_encoder_attention(y, wqkv, bqkv, wproj, bproj, H)


def loss_of(f):
    def g(*args):
        return jnp.sum(f(*args).astype(jnp.float32) ** 2)

    return g


def timeit(fn, args, iters=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = build()
    fa = jax.jit(path_a)
    fb = jax.jit(path_b)

    oa = fa(*args)
    ob = fb(*args)
    err = float(jnp.max(jnp.abs(oa.astype(jnp.float32)
                                - ob.astype(jnp.float32))))
    print(f"fwd max abs diff: {err:.2e}", file=sys.stderr)

    ga = jax.jit(jax.grad(loss_of(path_a), argnums=(0, 1, 2, 3, 4)))
    gb = jax.jit(jax.grad(loss_of(path_b), argnums=(0, 1, 2, 3, 4)))
    da = ga(*args)
    db = gb(*args)
    for i, (x, z) in enumerate(zip(da, db)):
        e = float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                  - z.astype(jnp.float32))))
        m = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) or 1.0
        print(f"grad[{i}] max abs diff: {e:.2e} (rel {e / m:.2e})",
              file=sys.stderr)

    ta = timeit(fa, args)
    tb = timeit(fb, args)
    print(f"fwd      A(transpose+packed): {ta:7.3f} ms   "
          f"B(direct fused): {tb:7.3f} ms")
    tga = timeit(ga, args)
    tgb = timeit(gb, args)
    print(f"fwd+bwd  A(transpose+packed): {tga:7.3f} ms   "
          f"B(direct fused): {tgb:7.3f} ms")
    print(f"per-12-layer step delta (bwd path): {(tga - tgb) * 12:.1f} ms")


if __name__ == "__main__":
    main()
