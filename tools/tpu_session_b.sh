#!/bin/bash
# Post-proof TPU measurement session (run AFTER tools/train_full_res_proof.sh):
#   1. filter-stage sub-profile (fused-NMS go/no-go data)
#   2. pre_nms_top_k parity sweep on the proof model
#   3. final bench.py rows: default, 21634 planes, batch 8
# One python process at a time; waits for a healthy relay between steps.
set -uo pipefail
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

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

echo "=== 1. filter sub-profile ==="
retry python tools/profile_filter.py || true

if [ -f /tmp/full_res_proof/model.npz ]; then
  echo "=== 2. top-k parity sweep ==="
  retry python tools/topk_parity.py || true
else
  echo "=== 2. SKIPPED (no proof model) ==="
fi

echo "=== 3. bench: default config ==="
retry python bench.py || true
echo "=== 3b. bench: 21634 planes ==="
GPP_BENCH_PLANES=21634 retry python bench.py || true
echo "=== 3c. bench: batch 8 ==="
GPP_BENCH_BATCH=8 retry python bench.py || true
echo "=== session B done ==="
