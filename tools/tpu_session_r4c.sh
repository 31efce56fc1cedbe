#!/bin/bash
# TPU session R4c: continuation of tools/tpu_session_r4.sh after its R4-5
# step hit the (since-fixed) fit() log-path crash and the script burned its
# retries on the dependent convert/eval. R4-2..R4-4 already succeeded
# (f32 / int8-absmax / int8-p99.9 on the 40-image val — see
# /tmp/session_r4.log); this script picks up from R4-5 and then runs the
# R4b run-network directory-throughput cases.
# One python process at a time (single-tenant chip).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
DATA40=${DATA40:-/tmp/full_res_kitti40}
DATA=${DATA:-/tmp/full_res_kitti}
PLANES="$DATA40/road_planes_database.mat"
OUT=${OUT:-/tmp/run_network_throughput}

if [ ! -f /tmp/full_res_2stage/model.npz ]; then
  echo "=== R4-5: two-stage arm (identical config, --no-fused-prepare) ==="
  retry python -m ground_plane_polling_tpu.bin.train \
    --backbone resnet50 --batch-size 2 --epochs 30 --steps 60 \
    --lr 1e-4 --bf16 --random-transform --no-evaluation \
    --no-fused-prepare \
    --snapshot auto --snapshot-every 10 \
    --snapshot-path /tmp/full_res_2stage/snapshots \
    --log-path /tmp/full_res_2stage/log.jsonl \
    kitti "$DATA" || true
  LATEST=$(ls -d /tmp/full_res_2stage/snapshots/step_* | sort | tail -1)
  retry python -m ground_plane_polling_tpu.bin.convert_model \
    "$LATEST" /tmp/full_res_2stage/model.npz --backbone resnet50 || true
fi
echo "=== R4-5b: two-stage arm eval, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  /tmp/full_res_2stage/model.npz "$DATA40" --subset val --eval-batch 4 \
  || true

if [ ! -f /tmp/full_res_canvas_aug/model.npz ]; then
  echo "=== R4-6: canvas-frame-augmentation arm (pre-fix behavior) ==="
  retry python tools/canvas_aug_ab.py /tmp/full_res_canvas_aug 30 || true
  LATEST=$(ls -d /tmp/full_res_canvas_aug/snapshots/step_* | sort | tail -1)
  retry python -m ground_plane_polling_tpu.bin.convert_model \
    "$LATEST" /tmp/full_res_canvas_aug/model.npz --backbone resnet50 || true
fi
echo "=== R4-6b: canvas-aug arm eval, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  /tmp/full_res_canvas_aug/model.npz "$DATA40" --subset val \
  --eval-batch 4 || true

echo "=== R4-7: batch-knee stage profile (VERDICT item 5) ==="
retry python tools/profile_batch_knee.py || true

echo "=== R4-8: bench.py, new phase-robust b4 headline (item 8) ==="
retry python bench.py || true

run_case () {
  local name="$1"; shift
  echo "=== R4b: run-network $name ==="
  rm -rf "$OUT/$name"
  retry python -m ground_plane_polling_tpu.bin.run_network \
    "$MODEL" "$DATA40/val/images" "$DATA40/val/calibs" "$PLANES" \
    "$OUT/$name" --kitti "$@" || true
}

run_case b1 --batch 1
run_case b4 --batch 4
run_case b4_int8_fuse --batch 4 --int8 8 --int8-percentile 99.9 \
  --fuse-towers

echo "=== session R4c done ==="
