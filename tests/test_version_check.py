import pytest

from ground_plane_polling_tpu.utils.version_check import (
    assert_compatible, check_jax_version, parse_version)


def test_parse_version():
    assert parse_version("0.4.30") == (0, 4, 30)
    assert parse_version("0.9.0") == (0, 9, 0)
    assert parse_version("1.0.0rc1") == (1, 0, 0)


def test_current_jax_passes():
    assert_compatible()


def test_too_old_raises():
    with pytest.raises(ImportError):
        check_jax_version(minimum=(99, 0, 0))
