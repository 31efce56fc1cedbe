"""TensorBoard event-writer tests.

The writer is pure Python (hand-rolled proto + masked CRC32C framing);
correctness is asserted by reading the files back with TensorFlow's own
record reader, which validates both CRCs and proto decoding.
"""

import glob
import json
import os

import numpy as np
import pytest

from ground_plane_polling_tpu.utils.tensorboard import (TensorBoardWriter,
                                                        jsonl_to_tensorboard)


def _read_events(logdir):
    tf = pytest.importorskip("tensorflow")
    from tensorflow.core.util import event_pb2

    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = []
    for raw in tf.data.TFRecordDataset(files[0]):
        events.append(event_pb2.Event.FromString(raw.numpy()))
    return events


def test_scalar_roundtrip(tmp_path):
    logdir = str(tmp_path / "tb")
    w = TensorBoardWriter(logdir)
    w.add_scalar("loss", 1.5, step=0)
    w.add_scalar("loss", 0.75, step=1)
    w.add_scalar("mAP", 0.25, step=1)
    w.close()

    events = _read_events(logdir)
    assert events[0].file_version == "brain.Event:2"
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events[1:] for v in e.summary.value]
    assert scalars == [
        (0, "loss", pytest.approx(1.5)),
        (1, "loss", pytest.approx(0.75)),
        (1, "mAP", pytest.approx(0.25)),
    ]
    assert all(e.wall_time > 0 for e in events)


def test_add_scalars_skips_non_numeric(tmp_path):
    logdir = str(tmp_path / "tb")
    w = TensorBoardWriter(logdir)
    w.add_scalars({"loss": 0.5, "checkpoint": "/path/to/ckpt",
                   "lr": 1e-5}, step=3)
    w.close()

    events = _read_events(logdir)
    tags = {v.tag for e in events for v in e.summary.value}
    assert tags == {"loss", "lr"}


def test_jsonl_conversion(tmp_path):
    jsonl = tmp_path / "log.jsonl"
    records = [
        {"epoch": 0, "loss": 2.0, "lr": 1e-5},
        {"epoch": 1, "loss": 1.0, "lr": 1e-5, "mAP": 0.1,
         "checkpoint": "snap/step_1"},
    ]
    jsonl.write_text("\n".join(json.dumps(r) for r in records) + "\n")

    logdir = str(tmp_path / "tb")
    n = jsonl_to_tensorboard(str(jsonl), logdir)
    assert n == 2

    events = _read_events(logdir)
    got = {(e.step, v.tag): v.simple_value
           for e in events for v in e.summary.value}
    assert got[(0, "loss")] == pytest.approx(2.0)
    assert got[(1, "mAP")] == pytest.approx(0.1)
    assert (1, "checkpoint") not in got


def test_fit_writes_tensorboard(tmp_path):
    """fit(tensorboard_dir=...) mirrors the per-epoch JSONL scalars."""
    import jax
    import jax.numpy as jnp

    from ground_plane_polling_tpu.models import build_detector
    from ground_plane_polling_tpu.ops import anchors as anchor_ops
    from ground_plane_polling_tpu.training.loop import fit
    from ground_plane_polling_tpu.training.train import (
        create_train_state, make_optimizer, make_train_step)

    img = (64, 64)
    n_anchors = anchor_ops.num_anchors_for_shape(img)
    model = build_detector("tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *img, 3), jnp.float32))
    tx = make_optimizer()
    state = create_train_state(variables, tx)

    batch = {
        "image": np.zeros((1, *img, 3), np.float32),
        "labels": np.zeros((1, n_anchors, 8), np.float32),
        "regression": np.zeros((1, n_anchors, 13), np.float32),
        "regression_dim": np.zeros((1, n_anchors, 4), np.float32),
    }
    batch["labels"][:, :2, 1] = 1.0
    batch["regression"][:, :2, 12] = 1.0
    batch["regression_dim"][:, :2, 3] = 1.0

    class Loader:
        def epoch(self):
            yield batch

        def __len__(self):
            return 1

    logdir = str(tmp_path / "tb")
    # the log path's parent does NOT exist yet: fit() must create it
    # rather than crash on open() (bit a real 30-epoch TPU session)
    log_path = tmp_path / "logs" / "nested" / "log.jsonl"
    fit(model, state, make_train_step(model, tx), Loader(), epochs=2,
        checkpoint_dir=None, log_path=str(log_path),
        tensorboard_dir=logdir, verbose=False)
    assert log_path.exists() and log_path.stat().st_size > 0

    events = _read_events(logdir)
    tags = {v.tag for e in events for v in e.summary.value}
    assert "loss" in tags and "lr" in tags
    steps = {e.step for e in events if e.summary.value}
    assert steps == {0, 1}


def test_logs_to_tb_cli(tmp_path):
    from ground_plane_polling_tpu.bin.logs_to_tb import main

    jsonl = tmp_path / "log.jsonl"
    jsonl.write_text(json.dumps({"epoch": 0, "loss": 1.0}) + "\n")
    main([str(jsonl), str(tmp_path / "tb")])
    events = _read_events(str(tmp_path / "tb"))
    assert any(v.tag == "loss" for e in events for v in e.summary.value)
