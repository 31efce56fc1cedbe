#!/bin/bash
# TPU session K:
#   1. int8 + fused cls/dim towers at b4 (do the two serving levers stack?)
#   2. int8 eval p99.9 re-measure under MEAN percentile aggregation
#      (session J measured per-batch-max aggregation; the review fix
#      changed the cross-batch aggregation for percentile<100)
set -uo pipefail
cd "$(dirname "$0")/.." || exit 1
source tools/tpu_lib.sh || exit 1

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
DATA=${DATA:-/tmp/full_res_kitti}

echo "=== K1. bench int8+fuse b4 ==="
# BATCH != 1 measures only that batch as the headline (aux lines
# are skipped automatically on batch-override runs)
GPP_BENCH_INT8=1 GPP_BENCH_FUSE=1 GPP_BENCH_BATCH=4 \
  GPP_BENCH_WINDOW_SECS=90 retry python bench.py || true

echo "=== K2. int8 eval p99.9, mean aggregation ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA" --subset val --eval-batch 4 --int8 8 \
  --int8-percentile 99.9 || true

echo "=== K3. async-checkpoint overlap (100 steps) ==="
retry python tools/bench_async_ckpt.py 100 || true

echo "=== session K done ==="
