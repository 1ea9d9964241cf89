import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  __import__("os").path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from arsvt_tpu.train.config import TrainConfig
from arsvt_tpu.train.train_step import make_classifier_step_fns

def run(remat, batch_size, steps=10, remat_policy="full"):
    cfg = TrainConfig(preset="vit_base_16_224", batch_size=batch_size,
                      bf16=True, augment="crop_flip", canvas=256,
                      total_steps=10**6, remat=remat,
                      remat_policy=remat_policy)
    init_fn, train_step, eval_step = make_classifier_step_fns(cfg, mesh=None)
    state = init_fn(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    batch = {"image": jnp.asarray(np.random.default_rng(0).uniform(
                 size=(batch_size, 256, 256, 3)).astype(np.float32)),
             "label": jnp.asarray(np.random.default_rng(1).integers(
                 0, 6, size=(batch_size,)), jnp.int32)}
    t0 = time.time()
    state, m = train_step(state, batch, rng); float(m["loss"])
    print(f"remat={remat} bs={batch_size} compile {time.time()-t0:.0f}s", flush=True)
    state, m = train_step(state, batch, rng); float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, batch, rng)
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"remat={remat}/{remat_policy} bs={batch_size}: {batch_size*steps/dt:.0f} img/s "
          f"({dt/steps*1e3:.0f} ms/step) loss={float(m['loss']):.3f}", flush=True)

import argparse
p = argparse.ArgumentParser()
p.add_argument("--configs", default="True:256,False:256")
args = p.parse_args()
pairs = []
for c in args.configs.split(","):
    parts = c.split(":")
    if parts[0] not in ("True", "False"):
        raise SystemExit(f"--configs remat field must be True|False, got {parts[0]!r}")
    pairs.append((parts[0] == "True", int(parts[1]),
                  parts[2] if len(parts) > 2 else "full"))
for remat, bs, pol in pairs:
    try:
        run(remat, bs, remat_policy=pol)
    except Exception as e:
        s = str(e); i = s.find("Ran out")
        print(f"({remat},{bs},{pol}) failed:", (s[i:i+250] if i >= 0 else s[:250]).replace("\n", " "), flush=True)
print("ALLDONE")
