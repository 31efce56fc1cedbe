#!/usr/bin/env bash
# Round-5 on-chip items, batched (one python at a time, per CLAUDE.md):
#   1. HBM bandwidth microbench          -> roofline memory axis
#   2. full bench.py                     -> r05 numbers + phase evidence
#   3. roofline table (host-side) with the measured BW
# Usage: bash tools/tpu_session_r5.sh [logfile]
set -u
cd "$(dirname "$0")/.."
. tools/tpu_lib.sh
LOG="${1:-/tmp/tpu_session_r5.log}"
: > "$LOG"
echo "logging to $LOG"

note() { printf '\n=== %s ===\n' "$*" | tee -a "$LOG"; }

note "1/3 HBM bandwidth microbench"
retry env JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
  timeout 900 python tools/bench_hbm.py 2>&1 | tee -a "$LOG"
BW=$(grep -o "hbm-gbps [0-9]*" "$LOG" | tail -1 | awk '{print $2}')
echo "measured BW: ${BW:-unmeasured} GB/s" | tee -a "$LOG"

note "2/3 full bench.py (phase-evidence lines included)"
retry env JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1 \
  timeout 3000 python bench.py 2>&1 | tee -a "$LOG"

note "3/3 roofline table (host-side, measured BW)"
PALLAS_AXON_POOL_IPS= timeout 600 python tools/roofline.py \
  --hbm-gbps "${BW:-1200}" 2>&1 | tee -a "$LOG"

note "done — record results in docs/PERFORMANCE.md"
