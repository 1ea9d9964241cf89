#!/bin/bash
# TPU revalidation runbook — run after a tunnel outage or any numerics-
# affecting change (e.g. a LayerNorm-eps change invalidates the XLA compile
# cache, so the first run recompiles every shape at ~3-7 min each).
#
# Run from a LOGIN shell (or `bash -lc benchmarks/tpu_revalidate.sh`) so the
# axon plugin env (PYTHONPATH=/root/.axon_site, JAX_PLATFORMS=axon) is set.
# Stages, in chip-efficiency order:
#   1. kernel parity   — every Pallas kernel vs its jnp oracle on the chip
#   2. full bench      — the driver's artifact (headline + BASELINE matrix)
#   3. full test suite — TPU-marked tests now un-skippable (backend == tpu)
# Never run anything else on the chip concurrently: the tunnel multiplexes
# and timed numbers contaminate.
set -u
# self-contained env (non-interactive shells lack the venv python and
# axon plugin path)
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/.axon_site
export JAX_PLATFORMS=axon
cd "$(dirname "$0")/.."

echo "=== probe: backend init ==="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU tunnel unreachable — aborting" >&2
    exit 3
fi

echo "=== 1/4 kernel parity (tests/test_pallas_kernels.py) ==="
timeout 3600 python -m pytest tests/test_pallas_kernels.py -q || exit 1

echo "=== 2/4 full bench (bench.py, BASELINE matrix) ==="
timeout 7200 python bench.py || exit 1

echo "=== 3/4 full test suite ==="
timeout 3600 python -m pytest tests/ -q || exit 1

echo "=== 4/4 serving load (16 concurrent clients, micro-batching) ==="
timeout 1200 python benchmarks/serving_load.py --clients 16 --duration 30 \
    --max-batch 8 --preset vit_base_16_224 \
    | tee serving_load_tpu.json || exit 1

echo "=== TPU revalidation complete ==="
