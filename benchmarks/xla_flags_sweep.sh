#!/bin/bash
# XLA compiler-flag sweep on the champion config (bench.py --fast).
# Each run is a full headline measurement; flags that XLA rejects fail
# loudly. Results append to /tmp/xla_flags_sweep.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/xla_flags_sweep.log
: > "$LOG"

run() {
  local name="$1"; shift
  local flags="$*"
  echo "=== $name [$flags]" | tee -a "$LOG"
  XLA_FLAGS="$flags" timeout 900 bash -lc \
    'PYTHONPATH=/root/repo:${PYTHONPATH:-} /opt/venv/bin/python /root/repo/bench.py --fast' \
    2>&1 | tail -3 | tee -a "$LOG"
}

run control ""
run lhs "--xla_tpu_enable_latency_hiding_scheduler=true"
run lhs_mem "--xla_tpu_enable_latency_hiding_scheduler=true --xla_tpu_memory_limit_slack_gib=1"
