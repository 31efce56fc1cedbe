"""Checkpoint save/restore (orbax) + portable weight export.

Replaces the reference's per-epoch h5 ModelCheckpoint + --snapshot resume
(/root/reference/keras_retinanet_3D/bin/train.py:168-182,343-347): the full
TrainState (step, params, frozen BN stats, optimizer state, lr) round-trips
through orbax, and `export_params` / `import_params` write a flat .npz of
(params + frozen) for inference-only distribution — the equivalent of the
reference's convert-model artifact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .train import TrainState

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint",
           "export_params", "import_params", "AsyncCheckpointSaver"]


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")


@jax.jit
def _tree_copy(tree):
    """Fresh device buffers for a whole pytree in one compiled program
    (jit caches per tree structure; input shardings are preserved on the
    copies, so mesh-resident states stay mesh-resident)."""
    return jax.tree.map(jnp.copy, tree)


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    import orbax.checkpoint as ocp

    path = _ckpt_path(ckpt_dir, int(state.step))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state._asdict()), force=True)
    return path


class AsyncCheckpointSaver:
    """Overlap checkpoint device->host pulls with continued training.

    On a remote-attached chip the full TrainState pull dominates snapshot
    cost (~2 min for a ResNet-50 state at observed relay bandwidth —
    docs/PERFORMANCE.md), during which a synchronous save_checkpoint
    stalls the training loop. save() instead makes an on-device copy of
    the state (cheap HBM->HBM; required for correctness — the jitted
    train step DONATES the state buffers, so the live state cannot be
    read after the next step is dispatched) and hands it to a writer
    thread that pulls and writes the orbax checkpoint while the main
    thread keeps dispatching steps.

    One save is in flight at a time: a second save() (or wait()) joins
    the first; a writer-thread failure is re-raised there so a bad save
    cannot pass silently. The reference's per-epoch h5 ModelCheckpoint
    (/root/reference/keras_retinanet_3D/bin/train.py:168-182) is fully
    synchronous; this is a TPU-native extension.
    """

    def __init__(self):
        self._thread = None
        self._error = None
        self._path = None

    def save(self, ckpt_dir: str, state: TrainState) -> str:
        import threading

        import orbax.checkpoint as ocp

        self.wait()
        path = _ckpt_path(ckpt_dir, int(state.step))
        # independent device buffers: donation of `state` by the next
        # train step cannot invalidate them. ONE jitted program for the
        # whole tree: eager per-leaf jnp.copy dispatches a jit(copy) per
        # distinct leaf shape — measured 256 s of cold micro-compiles for
        # the 171-leaf resnet50 TrainState on the dryrun box vs one
        # ~second tree-copy compile (round-5 dryrun sub-stage timings).
        copy = _tree_copy(state._asdict())

        def _write():
            try:
                with ocp.PyTreeCheckpointer() as ckptr:
                    ckptr.save(path, jax.device_get(copy), force=True)
            except BaseException as e:  # surfaced on the next wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="gpp-ckpt-writer", daemon=True)
        self._thread.start()
        self._path = path
        return path

    def wait(self) -> Optional[str]:
        """Join the in-flight save (if any); returns its path."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            # the failed save's path must not be reported as the last
            # good checkpoint by a subsequent wait()
            self._path = None
            raise RuntimeError("async checkpoint save failed") from err
        return self._path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def prune_checkpoints(ckpt_dir: str, keep: int = 5) -> int:
    """Delete all but the newest `keep` checkpoints; returns #removed.

    keep <= 0 disables pruning (keeps everything) — the safe reading for
    a function that deletes training history; fit() passes this through
    for keep_checkpoints=0."""
    import shutil

    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return 0
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    removed = 0
    for d in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
        removed += 1
    return removed


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (an abstract or concrete
    TrainState from create_train_state)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template._asdict()))
    return TrainState(**restored)


# ---------------------------------------------------------------------------
# flat npz export (inference weights)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_params(path: str, variables) -> None:
    """Write {'params': ..., 'frozen': ...} to one flat .npz."""
    flat = _flatten(jax.device_get(
        {"params": variables["params"],
         "frozen": variables.get("frozen", {})}))
    np.savez(path, **flat)


def import_params(path: str):
    """Load an exported .npz back into a variables dict.

    Leaves are host numpy arrays. Inference CLIs that call a jitted
    function repeatedly must pass the tree through device_resident()
    first — see its docstring for why.
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    return {"params": tree.get("params", {}), "frozen": tree.get("frozen", {})}


def device_resident(variables):
    """One explicit jax.device_put of the whole variables tree.

    A jitted function re-transfers any host numpy argument on EVERY
    call; with import_params() output that is the entire weight set
    (~150 MB for the resnet50 detector), which on the remote-TPU relay
    costs ~12 s per dispatch — run-network measured 0.08 img/s at b1
    before this, vs ~10 img/s directory throughput after (see
    docs/PERFORMANCE.md round 4). Putting the tree once makes the
    leaves committed device arrays that every later call reuses.

    Not folded into import_params because convert_model round-trips
    npz -> npz on the host and must not bounce the weights through the
    device.
    """
    return jax.device_put(variables)
