#!/bin/bash
# Round-5 TPU work queue, part C — post-default-flip harvest.
# Runs AFTER the clean detector profile: ViT-L/16@384 roofline
# (VERDICT #5, dedicated chip for honest timings), then the non-timing
# probes (serving refresh + the cut-short no_attn_dropout rerun).
#
#   nohup bash -lc benchmarks/round5_tpu_queue_c.sh > /tmp/r5queuec.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
export PYTHONPATH=/root/.axon_site
export JAX_PLATFORMS=axon
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

run() {  # run <name> <timeout-s> <cmd...> — direct unbuffered log
    local name=$1 to=$2 rc
    shift 2
    echo "=== [$name] start $(date -u +%H:%M:%S) ==="
    timeout "$to" "$@" > "benchmarks/logs/$name.log" 2>&1
    rc=$?
    echo "rc=$rc" >> "benchmarks/logs/$name.log"
    tail -3 "benchmarks/logs/$name.log"
    echo "=== [$name] rc=$rc $(date -u +%H:%M:%S) ==="
}

# 1. ViT-L/16@384 roofline + step decomposition (VERDICT #5) — needs a
# quiet chip; generous timeout (big 384px compiles).
run vitl_roofline 6600 python -u benchmarks/vitl_roofline.py

# 2. serving load refresh post dispatch fixes (uint8 frames, single
# blocking fetch) — refreshes serving_load_tpu.json via the log line.
run serving_r5 1500 python -u benchmarks/serving_load.py --clients 16 \
    --duration 30
python - <<'EOF'
import json, pathlib
p = pathlib.Path("benchmarks/logs/serving_r5.log")
if p.exists():
    lines = [l for l in p.read_text().splitlines() if l.startswith("{")]
    if lines:
        pathlib.Path("serving_load_tpu.json").write_text(lines[-1] + "\n")
        print("serving_load_tpu.json refreshed")
EOF

# 3. no_attn_dropout rerun (post float|None fix) — the 18:48 attempt
# trained to step 10000 but its val sweep was cut by the old 3000s
# timeout; timing is irrelevant here, only the merged mAP row.
run ablate_no_attn_dropout_r5 6000 \
    python -u benchmarks/recipe_ablation.py --ablation no_attn_dropout

echo "=== queue C drained $(date -u +%H:%M:%S) ==="
