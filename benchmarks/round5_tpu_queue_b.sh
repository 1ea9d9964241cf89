#!/bin/bash
# Round-5 TPU work queue, part B — runs AFTER queue A's warp A/B readout
# and the default-flip decision (the flip changes what bench.py measures).
#
#   nohup bash -lc benchmarks/round5_tpu_queue_b.sh > /tmp/r5queueb.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/.axon_site
export JAX_PLATFORMS=axon
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

echo "=== probe: backend init ==="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU tunnel unreachable — aborting" >&2
    exit 3
fi

run() {  # run <name> <timeout-s> <cmd...>
    local name=$1 to=$2 rc
    shift 2
    echo "=== [$name] start $(date -u +%H:%M:%S) ==="
    timeout "$to" "$@" > "benchmarks/logs/$name.log" 2>&1
    rc=$?
    tail -5 "benchmarks/logs/$name.log"
    echo "=== [$name] rc=$rc $(date -u +%H:%M:%S) ==="
}

# 1. the driver-comparable bench with the promoted warp default —
# detector target >= 450 img/s (VERDICT #2 done-criterion)
run bench_r5 7200 python bench.py

# 2. detector step decomposition under the promoted default (in-step
# confirmation of the warpbench delta; env var is fine here — one
# process per variant, traced once)
run detprofile_r5 3600 python benchmarks/detector_profile.py

# 3. ViT-L/16@384 roofline + step decomposition (VERDICT #5)
run vitl_roofline 5400 python benchmarks/vitl_roofline.py

# 4. serving load against the chip, post dispatch fixes (refresh
# serving_load_tpu.json)
run serving_r5 1200 python benchmarks/serving_load.py --clients 16 \
    --duration 30
if [ -s benchmarks/logs/serving_r5.log ]; then
    python - <<'EOF'
import json, pathlib
lines = [l for l in pathlib.Path("benchmarks/logs/serving_r5.log")
         .read_text().splitlines() if l.startswith("{")]
if lines:
    pathlib.Path("serving_load_tpu.json").write_text(lines[-1] + "\n")
    print("serving_load_tpu.json refreshed")
EOF
fi

# 5. best-two-deltas combo ablation (bs64 0.0147 + lr3e4_cosine 0.0057)
run ablate_bs64_lr3e4 5400 \
    python benchmarks/recipe_ablation.py --ablation bs64_lr3e4

# 6. full on-chip suite with a clean tally (VERDICT #8)
run suite_r5 5400 python -m pytest tests/ -q

echo "=== queue B drained $(date -u +%H:%M:%S) ==="
