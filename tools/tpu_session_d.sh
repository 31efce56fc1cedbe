#!/bin/bash
# TPU session D: longer training on the full-res synthetic set (cache-warm
# epochs are ~30 s) to get a properly-converged model, then re-run the
# pre_nms_top_k parity sweep with it. Run AFTER train_full_res_proof.sh
# (reuses its dataset and compile cache).
set -uo pipefail
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

ROOT=/tmp/full_res_kitti
OUT=/tmp/full_res_long
EPOCHS="${GPP_LONG_EPOCHS:-30}"

wait_healthy() {
  for i in $(seq 1 30); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
(jnp.ones((4,4)) @ jnp.ones((4,4))).block_until_ready()
" >/dev/null 2>&1; then return 0; fi
    echo "[wait_healthy] relay not ready ($i)" >&2
    sleep 60
  done
  return 1
}

retry() {
  for attempt in 1 2 3; do
    wait_healthy || true
    if "$@"; then return 0; fi
    echo "[retry] attempt $attempt failed: $*" >&2
    sleep 60
  done
  return 1
}

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
