#!/bin/bash
# TPU measurement session C: fused cls+dim tower evaluation.
#   1. component profile incl. fused tower + conv width sweep (profile_fwd)
#   2. bench.py A/B: default vs GPP_BENCH_FUSE=1, batch 1 and 4
# One python process at a time; waits for a healthy relay between steps.
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh



echo "=== C1. forward component profile (incl. fused tower + width sweep) ==="
retry python tools/profile_fwd.py || true

echo "=== C2a. bench baseline b1 (same session) ==="
GPP_BENCH_INT8_WINDOW_SECS=0 retry python bench.py || true
echo "=== C2b. bench FUSED b1 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_FUSE=1 retry python bench.py || true
echo "=== C2c. bench baseline b4 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_BATCH=4 retry python bench.py || true
echo "=== C2d. bench FUSED b4 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_FUSE=1 GPP_BENCH_BATCH=4 retry python bench.py || true
echo "=== session C done ==="
