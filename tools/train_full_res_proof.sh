#!/bin/bash
# Full-resolution TPU training proof (VERDICT round-1 item 5):
# resnet50 @ 512x1408 on the real chip, through the real CLIs:
#   train (2 epochs, per-epoch eval + checkpoints + TensorBoard)
#   -> resume from --snapshot auto (1 more epoch)
#   -> convert-model -> run-network on a val image.
# One python process at a time (single-tenant chip).
set -euo pipefail
cd /root/repo
source tools/tpu_lib.sh

ROOT=/tmp/full_res_kitti
OUT=/tmp/full_res_proof
rm -rf "$OUT"; mkdir -p "$OUT"



if [ ! -d "$ROOT/train/images" ]; then
  PALLAS_AXON_POOL_IPS= python tools/synthetic_kitti.py "$ROOT"
fi

echo "=== phase A: train 2 epochs (60 steps each, batch 2, eval on) ==="
retry python -m ground_plane_polling_tpu.bin.train \
  --backbone resnet50 --batch-size 2 --epochs 2 --steps 60 \
  --lr 5e-5 --bf16 --random-transform \
  --snapshot-path "$OUT/snapshots" \
  --log-path "$OUT/log.jsonl" \
  --tensorboard-dir "$OUT/tb" \
  kitti "$ROOT"

echo "=== phase B: resume from latest snapshot, 1 more epoch ==="
retry python -m ground_plane_polling_tpu.bin.train \
  --backbone resnet50 --batch-size 2 --epochs 1 --steps 60 \
  --lr 5e-5 --bf16 --random-transform \
  --snapshot auto --snapshot-path "$OUT/snapshots" \
  --log-path "$OUT/log.jsonl" \
  --tensorboard-dir "$OUT/tb" \
  kitti "$ROOT"

echo "=== phase C: convert latest checkpoint ==="
LATEST=$(ls -d "$OUT"/snapshots/step_* | sort | tail -1)
retry python -m ground_plane_polling_tpu.bin.convert_model \
  "$LATEST" "$OUT/model.npz" --backbone resnet50

echo "=== phase D: run-network on the val split ==="
retry python -m ground_plane_polling_tpu.bin.run_network \
  --backbone resnet50 --kitti --save-images \
  "$OUT/model.npz" "$ROOT/val/images" "$ROOT/val/calibs" \
  "$ROOT/road_planes_database.mat" "$OUT/detections" || \
retry python -m ground_plane_polling_tpu.bin.run_network --help

echo "=== results ==="
cat "$OUT/log.jsonl"
ls "$OUT/detections" 2>/dev/null | head
