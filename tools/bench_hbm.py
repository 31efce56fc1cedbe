"""Measure sustained HBM bandwidth on the attached TPU chip.

Feeds tools/roofline.py --hbm-gbps (VERDICT r04 item 4): the roofline's
memory axis needs a MEASURED bandwidth, not a datasheet guess — this chip
is only reachable through the relay, and its generation is not otherwise
discoverable from here.

Kernel: a bandwidth-bound elementwise pass over a large bf16 array, run
through bench.py's chained differencing protocol so the relay's fixed
round-trip and phase flips are handled identically to every other
measurement on this box. Byte accounting per steady-state iteration:
the protocol's chaining add (`images + carry`, eager, read+write) plus
the jitted scale pass (read+write) = 4 array passes x 2 bytes (bf16)
= 8 bytes/element. The protocol's first-in-run iteration runs an f32
variant (its initial carry is f32); both differenced runs contain
exactly one such iteration, so it cancels in t(N2) - t(N1).

  tools/tpu_run.sh python tools/bench_hbm.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

from bench import measure_envelope_fn

N_ELTS = int(os.environ.get("GPP_HBM_ELTS", 256 * 1024 * 1024))  # 512 MiB
WINDOW = float(os.environ.get("GPP_HBM_WINDOW_SECS", 60))


def main():
    x = jnp.full((N_ELTS,), 1.0, jnp.bfloat16)

    @jax.jit
    def step(v):
        # cast pins the steady-state chain to bf16 (the protocol's first
        # iteration arrives f32); the multiply constant keeps values in a
        # safe range across hundreds of chained applications
        v = v.astype(jnp.bfloat16)
        return v * jnp.bfloat16(0.9995) + jnp.bfloat16(5e-4)

    per_iter, estimates = measure_envelope_fn(
        step, x, lambda o: o[0], WINDOW, 3)
    bytes_per_iter = 4 * 2 * N_ELTS  # 4 bf16 passes (see module docstring)
    gbps = bytes_per_iter / per_iter / 1e9
    med = sorted(estimates)[len(estimates) // 2]
    print(f"array: {N_ELTS * 2 / 2**20:.0f} MiB bf16; "
          f"{len(estimates)} estimates")
    print(f"HBM bandwidth envelope: {gbps:.0f} GB/s "
          f"(median {bytes_per_iter / med / 1e9:.0f} GB/s)")
    print(f"-> tools/roofline.py --hbm-gbps {gbps:.0f}")


if __name__ == "__main__":
    main()
