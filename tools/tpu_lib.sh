# Shared helpers for TPU session scripts: relay health probe + retry.
# Source from a script that already cd'd to /root/repo:
#   source tools/tpu_lib.sh
# Exports PYTHONPATH (append — NEVER replace: the environment's PYTHONPATH
# carries the TPU backend registration, see CLAUDE.md) and the persistent
# compile cache.

export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1

wait_healthy() {
  local tries="${WAIT_HEALTHY_TRIES:-30}"
  for i in $(seq 1 "$tries"); do
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
  local attempts="${RETRY_ATTEMPTS:-3}"
  for attempt in $(seq 1 "$attempts"); do
    wait_healthy || true
    if "$@"; then return 0; fi
    echo "[retry] attempt $attempt failed: $*" >&2
    sleep 60
  done
  echo "[retry] giving up on: $*" >&2
  return 1
}
