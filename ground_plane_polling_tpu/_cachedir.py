"""Host-keyed persistent compile-cache directories (stdlib-only module).

Why: this box is re-imaged between rounds and restarts can land on a
DIFFERENT host CPU type. JAX's persistent compile cache stores AOT host
code; loading an entry compiled for another machine type triggers XLA's
"+prefer-no-scatter is not supported on the host machine ... could lead to
SIGILL" warnings and, at worst, SIGILL. Keying the CPU cache directory by
the host's CPU feature flags makes every host type miss cleanly into its
own directory instead of loading foreign AOT code.

The TPU cache (/root/.jax_cache) is NOT keyed: its executables target the
TPU behind the relay, not the host CPU.

This module must stay stdlib-only: tests/conftest.py imports it before
jax's platform is configured.
"""

import hashlib
import os


def host_key() -> str:
    """Stable 8-hex digest of this host's CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.machine().encode()).hexdigest()[:8]


def cpu_cache_dir() -> str:
    """Persistent XLA compile-cache dir for CPU-backend programs."""
    override = os.environ.get("GPP_CPU_CACHE_DIR")
    return override or f"/root/.jax_cache_cpu_{host_key()}"
