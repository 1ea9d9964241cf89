#!/bin/bash
# Round-5 TPU work queue, part A — convergence + warp measurement work
# that gates the default-flip decision. Start with:
#
#   nohup bash -lc benchmarks/round5_tpu_queue.sh > /tmp/r5queue.log 2>&1 &
#
# Value-per-chip-minute order (VERDICT round-4 items in brackets).
# Part B (bench.py with the flipped default, serving_load_tpu, ViT-L
# decomposition, on-chip suite) runs AFTER the A/B gate is read out —
# the default flip changes what bench.py measures, so it cannot be
# queued blind.
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

# 1. [#2a] warp bench with the variant on the STATIC config — the round-4
# env-var rows re-served one compiled trace; these are the first honest
# per-variant full-augment numbers (reconciles warpbench vs detprofile).
run warpbench_r5 1800 python benchmarks/warp_bench.py
run warpbench384_r5 1800 python benchmarks/warp_bench.py --size 384

# 2. [#2b] convergence A/B gate for the approximate resampler: identical
# recipe + seeds, only the warp variant differs. Canonical >=1024-image
# val split (also re-emits the stale 80-image artifact, VERDICT #4b/#6).
run detgen_taps 10800 env DEMO_WARP=taps \
    DEMO_OUT=detection_generalization_taps.json \
    python benchmarks/detection_generalization_demo.py
run detgen_shear 10800 env DEMO_WARP=shear_matmul \
    DEMO_OUT=detection_generalization_shear.json \
    python benchmarks/detection_generalization_demo.py

# 3. [#3] remaining recipe ablations (single-delta rerun + escalation
# ladder). no_attn_dropout was a silent no-op in round 4 (falsy check).
run ablate_no_attn_dropout2 3600 \
    python benchmarks/recipe_ablation.py --ablation no_attn_dropout
run ablate_combo_stability 3600 \
    python benchmarks/recipe_ablation.py --ablation combo_stability
run ablate_combo_working_recipe 3600 \
    python benchmarks/recipe_ablation.py --ablation combo_working_recipe
run ablate_no_augment 3600 \
    python benchmarks/recipe_ablation.py --ablation no_augment

echo "=== queue A drained $(date -u +%H:%M:%S) ==="
