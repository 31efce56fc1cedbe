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
  # The probe must be REPRESENTATIVE: in degraded relay phases a tiny
  # matmul still completes while a real program stalls indefinitely
  # (observed 2026-08-20: 4x4 matmul green, cached resnet detect stuck
  # >10 min at executable-load/execute). Gate on a multi-MB upload +
  # a conv program + a result pull so the gate fails when real work
  # would stall. Compiles once ever (persistent cache).
  local tries="${WAIT_HEALTHY_TRIES:-30}"
  for i in $(seq 1 "$tries"); do
    if timeout 150 python -c "
import numpy as np, jax, jax.numpy as jnp
x = jax.device_put(np.ones((4, 512, 512, 3), np.uint8))  # ~3 MiB up
w = jax.device_put(np.ones((3, 3, 3, 32), np.float32))
@jax.jit
def f(x, w):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (2, 2), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return (y * y).sum(axis=(1, 2))
np.asarray(f(x, w))  # executable load + execute + pull
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
