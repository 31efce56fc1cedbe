"""Prefetching iterator: full consumption and mid-epoch abandonment both
leave no producer thread behind."""

import threading
import time

import pytest

from ground_plane_polling_tpu.data.kitti import KittiDataset
from ground_plane_polling_tpu.data.pipeline import KittiLoader

from .fixtures import make_synthetic_kitti


@pytest.fixture(scope="module")
def loader(tmp_path_factory):
    root = make_synthetic_kitti(str(tmp_path_factory.mktemp("kitti_pf")))
    ds = KittiDataset(root, "train")
    return KittiLoader(ds, batch_size=1, image_min_side=128,
                       image_max_side=448, pad_multiple=64, shuffle=False)


def _thread_count():
    return threading.active_count()


def test_full_epoch_consumed(loader):
    before = _thread_count()
    batches = list(loader.epoch(prefetch=2))
    assert len(batches) == len(loader)
    time.sleep(0.5)
    assert _thread_count() <= before + 1


def test_abandoned_epoch_releases_producer(loader):
    before = _thread_count()
    for _ in range(3):
        it = loader.epoch(prefetch=2)
        next(it)        # take one batch
        it.close()      # abandon mid-epoch
    time.sleep(1.5)
    assert _thread_count() <= before + 1, "producer threads leaked"


def test_partial_final_batch_is_masked(tmp_path):
    """A short final group is padded to the static batch size by repeating
    the last sample, and the filler rows are fully loss-masked (states -1),
    so per-epoch gradients match the reference's smaller final group."""
    import numpy as np

    root = make_synthetic_kitti(str(tmp_path / "kitti"), n_images=4)
    ds = KittiDataset(root, "train")  # 3 images
    loader = KittiLoader(ds, batch_size=2, image_min_side=128,
                         image_max_side=448, pad_multiple=64, shuffle=False)

    assert len(loader) == 2
    batches = list(loader.epoch(prefetch=0))
    assert [b["image"].shape[0] for b in batches] == [2, 2]

    full, partial = batches
    # real samples carry positive/negative anchor states
    assert np.any(np.asarray(full["labels"]) != -1.0)
    assert np.any(np.asarray(partial["labels"][0]) != -1.0)
    # filler row: everything ignored
    filler_labels = np.asarray(partial["labels"][1])
    assert np.all(filler_labels == -1.0)
    assert np.all(np.asarray(partial["regression"][1, :, 12]) == -1.0)
    assert np.all(np.asarray(partial["regression_dim"][1, :, 3]) == -1.0)
    # and each real sample is visited exactly once per epoch
    seen = [idx for (idxs, n) in loader._groups for idx in idxs[:n]]
    assert sorted(seen) == list(range(3))


def test_producer_error_propagates(tmp_path):
    """An exception in the prefetch producer (e.g. a corrupt image) must
    re-raise in the consumer, not silently truncate the epoch."""
    root = make_synthetic_kitti(str(tmp_path / "kitti_err"))
    ds = KittiDataset(root, "train")
    ldr = KittiLoader(ds, batch_size=1, image_min_side=128,
                      image_max_side=448, pad_multiple=64, shuffle=False)

    boom = RuntimeError("corrupt image")

    calls = {"n": 0}
    orig = ldr._load_padded

    def failing(idx):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise boom
        return orig(idx)

    ldr._load_padded = failing
    before = _thread_count()
    with pytest.raises(RuntimeError, match="corrupt image"):
        list(ldr.epoch(prefetch=2))
    assert calls["n"] >= 2
    # the error path must also reap the producer (module contract)
    deadline = time.time() + 10
    while _thread_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert _thread_count() <= before

