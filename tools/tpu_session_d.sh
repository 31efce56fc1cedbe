#!/bin/bash
# TPU session D: longer training on the full-res synthetic set (cache-warm
# epochs are ~30 s) to get a properly-converged model, then re-run the
# pre_nms_top_k parity sweep with it. Run AFTER train_full_res_proof.sh
# (reuses its dataset and compile cache).
set -uo pipefail
cd /root/repo
source tools/tpu_lib.sh

ROOT=/tmp/full_res_kitti
OUT=/tmp/full_res_long
EPOCHS="${GPP_LONG_EPOCHS:-30}"



if [ ! -d "$ROOT/train/images" ]; then
  PALLAS_AXON_POOL_IPS= python tools/synthetic_kitti.py "$ROOT"
fi
mkdir -p "$OUT"

echo "=== D1: train $EPOCHS epochs (60 steps, batch 2) ==="
retry python -m ground_plane_polling_tpu.bin.train \
  --backbone resnet50 --batch-size 2 --epochs "$EPOCHS" --steps 60 \
  --lr 1e-4 --bf16 --random-transform --no-evaluation \
  --snapshot auto --snapshot-every 10 \
  --snapshot-path "$OUT/snapshots" \
  --log-path "$OUT/log.jsonl" \
  kitti "$ROOT"

echo "=== D2: convert ==="
LATEST=$(ls -d "$OUT"/snapshots/step_* | sort | tail -1)
retry python -m ground_plane_polling_tpu.bin.convert_model \
  "$LATEST" "$OUT/model.npz" --backbone resnet50

echo "=== D3: top-k parity sweep on the converged model ==="
retry python tools/topk_parity.py "$OUT/model.npz" "$ROOT" || true
echo "=== session D done ==="
