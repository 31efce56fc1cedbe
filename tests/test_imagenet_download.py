"""md5/caching logic of the ImageNet weight auto-download
(reference models/resnet.py:38-59), with the network call faked — the
egress path itself is exercised as a clean failure."""

import hashlib
import os
import urllib.error

import numpy as np
import pytest

from ground_plane_polling_tpu.models.imagenet import (
    download_imagenet, imagenet_checksums)


@pytest.fixture
def fixture_h5(tmp_path, monkeypatch):
    """A local 'weights file' whose md5 is patched into the checksum
    table, plus a fetch stub that copies it and counts calls."""
    payload = np.random.RandomState(0).bytes(4096)
    src = tmp_path / "weights_src.bin"
    src.write_bytes(payload)
    md5 = hashlib.md5(payload).hexdigest()
    monkeypatch.setitem(
        __import__("ground_plane_polling_tpu.models.imagenet",
                   fromlist=["_CHECKSUMS"])._CHECKSUMS,
        "resnet50", md5)

    calls = []

    def fetch(url, dest):
        calls.append(url)
        with open(src, "rb") as f, open(dest, "wb") as g:
            g.write(f.read())

    return src, md5, fetch, calls


def test_download_verify_and_cache(tmp_path, fixture_h5):
    src, md5, fetch, calls = fixture_h5
    cache = str(tmp_path / "cache")
    path = download_imagenet("resnet50", cache_dir=cache, fetch=fetch)
    assert os.path.exists(path) and len(calls) == 1
    assert "ResNet-50-model.keras.h5" in path
    # second call: cache hit, no fetch
    path2 = download_imagenet("resnet50", cache_dir=cache, fetch=fetch)
    assert path2 == path and len(calls) == 1


def test_corrupt_cache_redownloads(tmp_path, fixture_h5):
    src, md5, fetch, calls = fixture_h5
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    bad = os.path.join(cache, "ResNet-50-model.keras.h5")
    with open(bad, "wb") as f:
        f.write(b"truncated")
    path = download_imagenet("resnet50", cache_dir=cache, fetch=fetch)
    assert len(calls) == 1  # re-downloaded over the corrupt file
    assert hashlib.md5(open(path, "rb").read()).hexdigest() == md5


def test_persistent_corruption_raises(tmp_path, fixture_h5):
    src, md5, fetch, calls = fixture_h5

    def bad_fetch(url, dest):
        calls.append(url)
        with open(dest, "wb") as f:
            f.write(b"always wrong")

    with pytest.raises(RuntimeError, match="md5"):
        download_imagenet("resnet50", cache_dir=str(tmp_path / "c"),
                          fetch=bad_fetch)


def test_no_egress_clean_error(tmp_path):
    def no_net(url, dest):
        raise urllib.error.URLError("no route to host")

    with pytest.raises(RuntimeError, match="backbone-h5"):
        download_imagenet("resnet50", cache_dir=str(tmp_path / "c"),
                          fetch=no_net)


def test_unknown_backbone_rejected(tmp_path):
    with pytest.raises(ValueError, match="vgg16"):
        download_imagenet("vgg16", cache_dir=str(tmp_path / "c"))


def test_checksum_table_matches_reference():
    # the reference's md5 table (models/resnet.py:46-52), verbatim
    assert imagenet_checksums() == {
        "resnet50": "3e9f4e4f77bbe2c9bec13b53ee1c2319",
        "resnet101": "05dc86924389e5b401a9ea0348a3213c",
        "resnet152": "6ee11ef2b135592f8031058820bb9e71",
    }
