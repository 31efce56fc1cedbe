#!/bin/bash
# TPU session R4: round-4 VERDICT items measured on the real chip.
#   Item 3 — re-measure the round-3 accuracy claims on the calibrated
#            40-image val set (/tmp/full_res_kitti40, seed 7):
#     R4-2  f32 anchor on the proof model (fused-prepare arm)
#     R4-3  int8 absmax
#     R4-4  int8 --int8-percentile 99.9
#     R4-5  two-stage (--no-fused-prepare) retrain -> eval (vs fused arm)
#     R4-6  canvas-frame-augmentation retrain (tools/canvas_aug_ab.py
#           reproduces the pre-session-L bug) -> eval (vs true-frame arm)
#   Item 5 — R4-7 batch-knee stage profile b2/b4/b8, bf16 + int8-fuse
#   Item 8 — R4-8 bench.py with the new phase-robust b4 headline
# One python process at a time (single-tenant chip); every stage retries
# through relay blips and the script continues past individual failures so
# one flaky stage doesn't cost the whole session.
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

MODEL=${MODEL:-/tmp/full_res_long/model.npz}
SNAPS=${SNAPS:-/tmp/full_res_long/snapshots}
DATA40=${DATA40:-/tmp/full_res_kitti40}
DATA=${DATA:-/tmp/full_res_kitti}

if [ ! -d "$DATA40/val/images" ]; then
  echo "=== R4-0: build the 40-image calibrated val fixture ==="
  PALLAS_AXON_POOL_IPS= python - <<'EOF'
import sys
sys.path.insert(0, "tools")
from synthetic_kitti import make_full_res_kitti
make_full_res_kitti("/tmp/full_res_kitti40", n_train=32, n_val=40,
                    n_planes=64, seed=7)
EOF
fi

if [ ! -f "$MODEL" ]; then
  echo "=== R4-1: convert the proof model ==="
  LATEST=$(ls -d "$SNAPS"/step_* | sort | tail -1)
  retry python -m ground_plane_polling_tpu.bin.convert_model \
    "$LATEST" "$MODEL" --backbone resnet50
fi

echo "=== R4-2: f32 anchor, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA40" --subset val --eval-batch 4 || true

echo "=== R4-3: int8 absmax, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA40" --subset val --eval-batch 4 --int8 8 || true

echo "=== R4-4: int8 p99.9, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA40" --subset val --eval-batch 4 --int8 8 \
  --int8-percentile 99.9 || true

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

echo "=== session R4 done ==="
