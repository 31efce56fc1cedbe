"""Checkpoint round-trip and reduce-on-plateau tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ground_plane_polling_tpu.models import build_detector
from ground_plane_polling_tpu.training.checkpoint import (
    AsyncCheckpointSaver, export_params, import_params, latest_checkpoint,
    restore_checkpoint, save_checkpoint)
from ground_plane_polling_tpu.training.schedule import ReduceLROnPlateau
from ground_plane_polling_tpu.training.train import (
    create_train_state, make_optimizer)


def _state(backbone="tiny"):
    # tiny backbone for the default lane (this box has one CPU; a
    # resnet50 init alone costs ~45 s); the slow-lane roundtrip keeps
    # the full resnet50 tree for big-pytree coverage
    model = build_detector(backbone)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx = make_optimizer()
    return variables, create_train_state(variables, tx, learning_rate=1e-5)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    variables, state = _state("resnet50")
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    path = save_checkpoint(str(tmp_path / "ckpt"), state)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(float(restored.lr), 1e-5, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_saver(tmp_path):
    """The background save writes a checkpoint identical to the
    synchronous path, survives mutation of the live state after save()
    returns (the on-device copy isolates it from buffer donation), and
    re-raises writer-thread failures on wait()."""
    _, state = _state()
    state = state._replace(step=jnp.asarray(3, jnp.int32))
    saver = AsyncCheckpointSaver()
    path = saver.save(str(tmp_path / "ckpt"), state)

    # mutate the "live" state while the save is (possibly) in flight —
    # the checkpoint must capture the values at save() time
    expected = [np.asarray(l) for l in jax.tree_util.tree_leaves(
        state.params)]
    state = state._replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params))
    assert saver.wait() == path

    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 3
    for a, b in zip(expected, jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # a second save joins the first and reuses the saver
    state2 = state._replace(step=jnp.asarray(4, jnp.int32))
    path2 = saver.save(str(tmp_path / "ckpt"), state2)
    assert saver.wait() == path2
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path2

    # writer failure: target dir path is an existing FILE
    blocker = tmp_path / "blocked"
    blocker.write_text("not a directory")
    saver.save(str(blocker / "sub"), state2)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()
    # error consumed, saver stays usable — and the FAILED save's path is
    # forgotten (a caller logging "last checkpoint" must not get a path
    # that was never written)
    assert saver.wait() is None


def test_async_saver_copies_before_donation(tmp_path, monkeypatch):
    """save() must hand the writer an on-device COPY: the train step
    donates the live state's buffers, so writing from the live arrays is
    a use-after-donate. CPU ignores donation, so pin it by identity —
    the tree the writer gets must share no buffers with the live state."""
    import ground_plane_polling_tpu.training.checkpoint as ckpt_mod

    def ptr(a):
        try:
            return a.unsafe_buffer_pointer()   # device buffer address
        except Exception:
            return id(a)

    _, state = _state()
    live_ptrs = {ptr(l) for l in jax.tree_util.tree_leaves(
        state._asdict()) if isinstance(l, jax.Array)}
    seen = {}
    orig_get = jax.device_get

    def spying_get(tree):
        seen["leaves"] = jax.tree_util.tree_leaves(tree)
        return orig_get(tree)

    monkeypatch.setattr(ckpt_mod.jax, "device_get", spying_get)
    saver = AsyncCheckpointSaver()
    saver.save(str(tmp_path / "ckpt"), state)
    saver.wait()
    assert seen["leaves"], "writer thread never pulled the state"
    shared = [l for l in seen["leaves"]
              if isinstance(l, jax.Array) and ptr(l) in live_ptrs]
    assert not shared, "writer got live (donatable) buffers, not copies"


def test_export_import_params(tmp_path):
    variables, _ = _state()
    p = str(tmp_path / "weights.npz")
    export_params(p, variables)
    loaded = import_params(p)
    # import_params always materializes a frozen collection (empty for
    # BN-free backbones like tiny)
    assert set(variables) <= set(loaded)
    for extra in set(loaded) - set(variables):
        assert not jax.tree_util.tree_leaves(loaded[extra])
    for coll in variables:  # params (+ frozen when the backbone has BN)
        for a, b in zip(jax.tree_util.tree_leaves(variables[coll]),
                        jax.tree_util.tree_leaves(loaded[coll])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reduce_lr_on_plateau():
    _, state = _state()
    sched = ReduceLROnPlateau(factor=0.1, patience=2)
    # improving: no change
    state, red = sched.update(state, 10.0)
    assert not red
    state, red = sched.update(state, 9.0)
    assert not red
    # plateau for two epochs -> reduce
    state, red = sched.update(state, 9.2)
    assert not red
    state, red = sched.update(state, 9.1)
    assert red
    np.testing.assert_allclose(float(state.lr), 1e-6, rtol=1e-5)
    # improvement resets
    state, red = sched.update(state, 5.0)
    assert not red


def test_prune_checkpoints_keep_zero(tmp_path):
    import os

    from ground_plane_polling_tpu.training.checkpoint import (
        prune_checkpoints)

    d = str(tmp_path / "snaps")
    os.makedirs(d)
    for s in (10, 20, 30):
        os.makedirs(os.path.join(d, f"step_{s:08d}"))
    assert prune_checkpoints(d, keep=2) == 1
    # keep<=0 DISABLES pruning — never delete a run's whole history
    assert prune_checkpoints(d, keep=0) == 0
    assert prune_checkpoints(d, keep=-3) == 0
    assert sorted(os.listdir(d)) == ["step_00000020", "step_00000030"]


def test_device_resident_makes_jit_calls_transfer_free(tmp_path):
    """import_params leaves are host numpy; a jitted detect fn re-uploads
    them on EVERY call (through the TPU relay that is ~150 MB/dispatch for
    resnet50 — run-network measured 0.08 img/s at b1 before the fix).
    device_resident must yield committed device arrays so repeated jitted
    calls move no bytes; pinned here with a transfer guard."""
    from ground_plane_polling_tpu.training.checkpoint import device_resident

    variables = {"params": {"w": np.ones((8, 8), np.float32)},
                 "frozen": {"m": np.zeros((8,), np.float32)}}
    export_params(str(tmp_path / "m.npz"), variables)
    loaded = import_params(str(tmp_path / "m.npz"))
    assert isinstance(loaded["params"]["w"], np.ndarray)  # host side

    resident = device_resident(loaded)
    assert isinstance(resident["params"]["w"], jax.Array)

    f = jax.jit(lambda v, x: v["params"]["w"] @ x + v["frozen"]["m"])
    x = jax.device_put(np.ones((8,), np.float32))
    f(resident, x).block_until_ready()  # compile outside the guard
    with jax.transfer_guard("disallow"):
        f(resident, x)  # device-resident tree: no implicit transfers
    with pytest.raises(Exception, match="[Dd]isallow"):
        with jax.transfer_guard("disallow"):
            f(loaded, x)  # host tree: would re-upload every call
