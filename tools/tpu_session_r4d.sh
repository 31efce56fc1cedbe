#!/bin/bash
# TPU session R4d: post-restart rebuild + the round-4 measurements that the
# device-resident-weights fix (9ed99c6) invalidated or that the restart
# wiped. Run AFTER tools/profile_batch_knee.py (knee is measured separately
# so its timing windows see a quiet host).
#   1. bench.py with the phase-robust b4 headline (rewarm + record)
#   2. rebuild the proof model (dataset + 30-epoch train + convert)
#   3. build the calibrated 40-image val fixture
#   4. R4b: run-network directory throughput b1 / b4 / b4 int8+fuse with
#      device-resident weights + device-resident plane DB (closes the
#      measurement half of VERDICT round-3 item 4)
#   5. f32 anchor eval of the rebuilt model on the 40-image val
# One python process at a time (single-tenant chip).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

DATA=${DATA:-/tmp/full_res_kitti}
OUTM=${OUTM:-/tmp/full_res_long}
DATA40=${DATA40:-/tmp/full_res_kitti40}
MODEL="$OUTM/model.npz"
PLANES="$DATA40/road_planes_database.mat"
OUT=${OUT:-/tmp/run_network_throughput}

echo "=== R4d-1: bench.py (b4 headline) ==="
retry python bench.py || true

if [ ! -d "$DATA/train/images" ]; then
  echo "=== R4d-2a: synthetic dataset ==="
  PALLAS_AXON_POOL_IPS= python tools/synthetic_kitti.py "$DATA"
fi
if [ ! -f "$MODEL" ]; then
  echo "=== R4d-2b: 30-epoch proof train ==="
  retry python -m ground_plane_polling_tpu.bin.train \
    --backbone resnet50 --batch-size 2 --epochs 30 --steps 60 \
    --lr 1e-4 --bf16 --random-transform --no-evaluation \
    --snapshot auto --snapshot-every 10 \
    --snapshot-path "$OUTM/snapshots" \
    --log-path "$OUTM/log.jsonl" \
    kitti "$DATA"
  LATEST=$(ls -d "$OUTM"/snapshots/step_* | sort | tail -1)
  retry python -m ground_plane_polling_tpu.bin.convert_model \
    "$LATEST" "$MODEL" --backbone resnet50
fi

if [ ! -d "$DATA40/val/images" ]; then
  echo "=== R4d-3: 40-image calibrated val fixture ==="
  PALLAS_AXON_POOL_IPS= python - <<'EOF'
import sys
sys.path.insert(0, "tools")
from synthetic_kitti import make_full_res_kitti
make_full_res_kitti("/tmp/full_res_kitti40", n_train=32, n_val=40,
                    n_planes=64, seed=7)
EOF
fi

run_case () {
  local name="$1"; shift
  echo "=== R4d-4: run-network $name ==="
  rm -rf "$OUT/$name"
  retry python -m ground_plane_polling_tpu.bin.run_network \
    "$MODEL" "$DATA40/val/images" "$DATA40/val/calibs" "$PLANES" \
    "$OUT/$name" --kitti "$@" || true
}
run_case b1 --batch 1
run_case b4 --batch 4
run_case b4_int8_fuse --batch 4 --int8 8 --int8-percentile 99.9 \
  --fuse-towers

echo "=== R4d-5: f32 anchor eval, 40-image val ==="
retry python -m ground_plane_polling_tpu.bin.evaluate \
  "$MODEL" "$DATA40" --subset val --eval-batch 4 || true

echo "=== session R4d done ==="
