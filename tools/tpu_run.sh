#!/bin/bash
# Serialize TPU jobs: wait until the axon relay accepts a claim, then run.
# Usage: tools/tpu_run.sh <command...>
set -u
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

for attempt in $(seq 1 12); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
(jnp.ones((4,4)) @ jnp.ones((4,4))).block_until_ready()
" >/dev/null 2>&1; then
    echo "[tpu_run] relay healthy (attempt $attempt)" >&2
    exec "$@"
  fi
  echo "[tpu_run] relay not ready, waiting... (attempt $attempt)" >&2
  sleep 60
done
echo "[tpu_run] giving up: relay unhealthy" >&2
exit 1
