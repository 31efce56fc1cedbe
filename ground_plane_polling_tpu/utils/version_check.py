"""Dependency version guard (the reference pins keras >= 2.2,
utils/keras_version.py; here the floor is the jax feature set we use:
NamedSharding/jit-sharding APIs and Pallas TPU)."""

from __future__ import annotations

MIN_JAX = (0, 4, 30)


def parse_version(v: str):
    parts = []
    for p in v.split(".")[:3]:
        digits = ""
        for ch in p:  # leading digits only ("0rc1" -> 0)
            if not ch.isdigit():
                break
            digits += ch
        parts.append(int(digits or 0))
    return tuple(parts)


def check_jax_version(minimum=MIN_JAX) -> None:
    import jax

    if parse_version(jax.__version__) < tuple(minimum):
        raise ImportError(
            f"ground_plane_polling_tpu requires jax >= "
            f"{'.'.join(map(str, minimum))}, found {jax.__version__}")


def assert_compatible() -> None:
    check_jax_version()
