#!/bin/bash
# TPU measurement session C: fused cls+dim tower evaluation.
#   1. component profile incl. fused tower + conv width sweep (profile_fwd)
#   2. bench.py A/B: default vs GPP_BENCH_FUSE=1, batch 1 and 4
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

echo "=== C1. forward component profile (incl. fused tower + width sweep) ==="
retry python tools/profile_fwd.py || true

echo "=== C2a. bench baseline b1 (same session) ==="
retry python bench.py || true
echo "=== C2b. bench FUSED b1 ==="
GPP_BENCH_FUSE=1 retry python bench.py || true
echo "=== C2c. bench baseline b4 ==="
GPP_BENCH_BATCH=4 retry python bench.py || true
echo "=== C2d. bench FUSED b4 ==="
GPP_BENCH_FUSE=1 GPP_BENCH_BATCH=4 retry python bench.py || true
echo "=== session C done ==="
