"""A/B: bf16 eval forward vs the int8 W8A8 quantized forward (ViT-B/16).

Measures images/sec for the plain `apply_image_classifier` (bf16, flash
attention) against `apply_image_classifier_int8` (models/quantized.py) at
serving-relevant batch sizes on the local TPU chip, plus the logit parity
between the two. Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from arsvt_tpu.models.classifier import (  # noqa: E402
    apply_image_classifier,
    init_image_classifier,
)
from arsvt_tpu.models.quantized import (  # noqa: E402
    apply_image_classifier_int8,
    quantize_image_classifier,
)
from arsvt_tpu.models.registry import get_preset  # noqa: E402

BATCHES = tuple(
    int(b) for b in os.environ.get("INT8_BENCH_BATCHES", "8,64,192").split(",")
)
STEPS = int(os.environ.get("INT8_BENCH_STEPS", "20"))


def time_fn(fn, *args, steps=STEPS):
    out = fn(*args)
    np.asarray(out)  # sync (block_until_ready is a no-op via the tunnel)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / steps, out


def main():
    cfg = get_preset("vit_base_16_224")
    params = init_image_classifier(jax.random.PRNGKey(0), cfg, num_classes=6)
    params["classifier"]["head"]["kernel"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(7), params["classifier"]["head"]["kernel"].shape
    )
    qparams = quantize_image_classifier(params, cfg)

    fp16_fwd = jax.jit(
        lambda p, x: apply_image_classifier(p, x.astype(jnp.bfloat16), cfg, 6)
    )
    int8_fwd = jax.jit(
        lambda q, x: apply_image_classifier_int8(q, x, cfg, 6)
    )

    rows = {}
    agree = None
    for b in BATCHES:
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(b, 224, 224, 3)),
            jnp.float32,
        )
        dt_fp, out_fp = time_fn(fp16_fwd, params, x)
        dt_q, out_q = time_fn(int8_fwd, qparams, x)
        rows[f"bs{b}"] = {
            "bf16_img_s": round(b / dt_fp, 1),
            "int8_img_s": round(b / dt_q, 1),
            "speedup": round(dt_fp / dt_q, 3),
        }
        agree = float(
            (np.asarray(out_fp).argmax(-1) == np.asarray(out_q).argmax(-1))
            .mean()
        )
        print(f"bs{b}: bf16 {b/dt_fp:.1f} img/s, int8 {b/dt_q:.1f} img/s "
              f"({dt_fp/dt_q:.2f}x), argmax agreement {agree:.3f}",
              file=sys.stderr, flush=True)
    print(json.dumps({"rows": rows, "argmax_agreement_last": agree}))


if __name__ == "__main__":
    main()
