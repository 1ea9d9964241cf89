#!/bin/bash
# Round-4 TPU work queue — run ONE of these the moment the tunnel is up:
#
#   nohup bash -lc benchmarks/round4_tpu_queue.sh > /tmp/r4queue.log 2>&1 &
#
# Stages in value-per-chip-minute order (VERDICT round-3 items in
# brackets); each stage logs to benchmarks/logs/ and keeps going on
# failure so one flaky stage doesn't starve the rest. Never run anything
# else on the chip concurrently (the tunnel multiplexes; timed numbers
# contaminate). Total budget ~7-8 h of chip time; stages are ordered so
# an early tunnel drop still leaves the headline validated.
set -u
# self-contained env: non-interactive shells don't get the venv python
# or the axon plugin path from the profile
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

# 1. [#1] kernel parity on the chip (ln_eps change revalidation)
run parity 3600 python -m pytest tests/test_pallas_kernels.py -q

# 2. [#1] full bench — the driver-comparable artifact (headline >=988)
run bench 7200 python bench.py

# 3. [#3] detector step decomposition + attention-path A/B
run detprofile 3600 python benchmarks/detector_profile.py

# 3b. [#3] affine-warp gather strategy A/B (augmentation is the prime
# suspect for most of the detector step; the winner becomes the default)
run warpbench 1800 python benchmarks/warp_bench.py
# 384 canvas: the ViT-L/384 RandAugment preset pays the same warp (its
# rotate branch executes for every image under vmapped lax.switch)
run warpbench384 1800 python benchmarks/warp_bench.py --size 384

# 3c. [#3] full detector step under the two candidate warps — the
# direct img/s comparison against stage 3's "taps" baseline
run detprofile_shear 3600 env ARSVT_WARP_VARIANT=shear_matmul \
    python benchmarks/detector_profile.py
run detprofile_patch 3600 env ARSVT_WARP_VARIANT=patch \
    python benchmarks/detector_profile.py

# 4. [#1] full suite on TPU
run suite 5400 python -m pytest tests/ -q

# 5. [#7] serving load against the chip
run serving 1200 python benchmarks/serving_load.py --clients 16 \
    --duration 30 --max-batch 8 --preset vit_base_16_224
python - <<'EOF'
import pathlib
try:
    for line in pathlib.Path(
            "benchmarks/logs/serving.log").read_text().splitlines():
        if line.strip().startswith("{"):
            pathlib.Path("serving_load_tpu.json").write_text(
                line.strip() + "\n")
            print("serving_load_tpu.json written")
            break
except OSError as e:
    print("no serving log:", e)
EOF

# 6. [#2] reference-recipe ablations. `faithful` first: the same-budget
# 10k-step control the single-delta rows compare against (the committed
# 25k-step control is a different budget). Rows merge into
# recipe_ablation.json as they land.
for ab in faithful no_attn_dropout grad_clip_01 no_triplet lr3e4_cosine \
          bs64 no_augment combo_stability combo_working_recipe; do
    run "ablate_$ab" 4000 python benchmarks/recipe_ablation.py --ablation "$ab"
done

# 7. [#6] detection generalization, headline recipe, 1024-image val split
# (matches the committed artifact's 40k-step/32k-image/augment=detection
# config; ~70 min)
run detgen 7200 env DEMO_STEPS=40000 DEMO_TRAIN_IMAGES=32000 \
    DEMO_VAL_IMAGES=1024 DEMO_AUG=detection \
    python benchmarks/detection_generalization_demo.py

echo "=== round-4 TPU queue complete $(date -u +%H:%M:%S) ==="
