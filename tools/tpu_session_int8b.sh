#!/bin/bash
# TPU session J: int8 percentile-calibration accuracy + int8 batch curve.
#   1. int8 eval, percentile 99.9  (absmax anchor measured in session I)
#   2. int8 eval, percentile 99.99
#   3. int8 bench at b2 and b8 (b1/b4 measured in session I)
# One python process at a time (single-tenant chip).
set -uo pipefail
cd "$(dirname "$0")/.." || exit 1
source tools/tpu_lib.sh || exit 1

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
DATA=${DATA:-/tmp/full_res_kitti}

for PCT in 99.9 99.99; do
  echo "=== J. int8 eval, percentile $PCT ==="
  retry python -m ground_plane_polling_tpu.bin.evaluate \
    "$MODEL" "$DATA" --subset val --eval-batch 4 --int8 8 \
    --int8-percentile "$PCT" || true
done

for B in 2 8; do
  echo "=== J. int8 bench b$B ==="
  # BATCH != 1 measures only that batch as the headline (aux lines
  # are skipped automatically on batch-override runs)
  GPP_BENCH_INT8=1 GPP_BENCH_BATCH=$B GPP_BENCH_WINDOW_SECS=90 \
    retry python bench.py || true
done

echo "=== session J done ==="
