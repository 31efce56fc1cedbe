#!/bin/bash
# TPU session I: int8 PTQ (models/quantize.py) measured on the real chip.
#   1. f32 eval anchor on the converged synthetic model (mAP)
#   2. the same eval with --int8 (accuracy delta)
#   3. one bench process with the int8 aux window enabled: bf16 b2/b4 aux,
#      int8 b1 aux, bf16 b1 headline — phase-fair within one process.
# One python process at a time (single-tenant chip).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
DATA=${DATA:-/tmp/full_res_kitti}

echo "=== I1. f32 eval anchor ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA" --subset val --eval-batch 4 || true

echo "=== I2. int8 eval (calibrate on first 8 val images) ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA" --subset val --eval-batch 4 --int8 8 || true

echo "=== I3. bench: bf16 headline + int8 aux (same process) ==="
# bench protocol changed (b4 headline + b1/b2/int8 aux lines):
# quick run = short headline window + int8 aux, other aux lines off
GPP_BENCH_INT8_WINDOW_SECS=90 GPP_BENCH_WINDOW_SECS=120 \
  GPP_BENCH_B1_WINDOW_SECS=45 GPP_BENCH_AUX_WINDOW_SECS=0 \
  retry python bench.py || true

echo "=== session I done ==="
