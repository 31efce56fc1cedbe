#!/bin/bash
# Post-proof TPU measurement session (run AFTER tools/train_full_res_proof.sh):
#   1. filter-stage sub-profile (fused-NMS go/no-go data)
#   2. pre_nms_top_k parity sweep on the proof model
#   3. final bench.py rows: default, 21634 planes, batch 8
# One python process at a time; waits for a healthy relay between steps.
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh



echo "=== 1. filter sub-profile ==="
retry python tools/profile_filter.py || true

if [ -f /tmp/full_res_proof/model.npz ]; then
  echo "=== 2. top-k parity sweep ==="
  retry python tools/topk_parity.py || true
else
  echo "=== 2. SKIPPED (no proof model) ==="
fi

echo "=== 3. bench: default config ==="
GPP_BENCH_INT8_WINDOW_SECS=0 retry python bench.py || true
echo "=== 3b. bench: 21634 planes ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_PLANES=21634 retry python bench.py || true
echo "=== 3c. bench: batch 8 ==="
GPP_BENCH_INT8_WINDOW_SECS=0 GPP_BENCH_BATCH=8 retry python bench.py || true
echo "=== session B done ==="
