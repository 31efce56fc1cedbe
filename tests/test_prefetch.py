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
