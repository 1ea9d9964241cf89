#!/bin/bash
# No-remat residual-diet sweep (VERDICT round-3 #1): fused-MLP bf16-u
# residual x save-probs attention backward x batch size. Each line:
# env config -> bench.py --fast headline img/s.
set -u
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python
OUT=${1:-/tmp/remat_sweep.log}
run() {
  local name="$1"; shift
  echo "=== $name ===" >>"$OUT"
  env "$@" "$PY" bench.py --fast --batch-size "${BS}" 2>&1 |
    grep -E "train:|OOM|RESOURCE|out of memory|Error" | head -4 >>"$OUT"
}
BS=192 run "fusedmlp bs192"              ARSVT_ENABLE_FUSED_MLP=1
BS=192 run "savep+fusedmlp bs192"        ARSVT_ATTN_SAVE_PROBS=1 ARSVT_ENABLE_FUSED_MLP=1
BS=256 run "fusedmlp bs256"              ARSVT_ENABLE_FUSED_MLP=1
BS=224 run "fusedmlp bs224"              ARSVT_ENABLE_FUSED_MLP=1
echo done >>"$OUT"
