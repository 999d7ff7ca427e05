"""Checkpoint / resume.

The reference saves a dict checkpoint {epoch, model, optimizer, scheduler,
min_loss, best_epoch} every N epochs and on each new best, plus a
weights-only ``model/model.pt`` for inference
(``experiments/train_test.py:262-286``). Here:

  * ``checkpoint.msgpack`` — full train state (params + optimizer state +
    step) + scalar metadata, serialized with flax msgpack;
  * ``model.msgpack``      — weights-only export for inference;

Schedules are pure functions of the step count, so restoring the step
restores the learning-rate schedule exactly (the reference must serialize
its stateful torch scheduler instead).
"""
from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "save_params",
           "load_params", "AsyncCheckpointer", "OrbaxCheckpointer",
           "make_checkpointer"]

_MAGIC = b"M3SGCKPT"


def _pack(tree) -> bytes:
    return serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, serialization.to_state_dict(tree)))


def save_checkpoint(path, state, epoch: int, min_loss: float,
                    best_epoch: Optional[int]) -> None:
    payload = {
        "meta": {
            "epoch": int(epoch),
            "min_loss": float(min_loss),
            "best_epoch": -1 if best_epoch is None else int(best_epoch),
            "step": int(state.step),
        },
        "state": serialization.to_state_dict(state),
    }
    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(np.asarray, payload))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load_checkpoint(path, state):
    """Restore (state, epoch, min_loss, best_epoch) from a checkpoint,
    using ``state`` as the structure template."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic == _MAGIC, f"{path}: not a checkpoint file"
        payload = serialization.msgpack_restore(f.read())
    meta = payload["meta"]
    state = serialization.from_state_dict(state, payload["state"])
    best_epoch = None if meta["best_epoch"] < 0 else int(meta["best_epoch"])
    return state, int(meta["epoch"]), float(meta["min_loss"]), best_epoch


class AsyncCheckpointer:
    """Asynchronous checkpoint writer: the device->host snapshot happens
    synchronously (cheap), serialization + disk IO run in a background
    thread so the train loop never blocks on storage. At most one write is
    in flight; a new save waits for the previous one (ordering preserved,
    and the atomic-replace in `save_checkpoint` means a crash mid-write
    never corrupts the previous checkpoint)."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def _run(self, fn, *args):
        try:
            fn(*args)
        except BaseException as e:  # surfaced by the next wait()/close()
            self._error = e

    def save(self, path, state, epoch: int, min_loss: float,
             best_epoch: Optional[int]) -> None:
        host_state = jax.tree_util.tree_map(np.asarray, state)
        self.wait()
        self._thread = threading.Thread(
            target=self._run,
            args=(save_checkpoint, path, host_state, epoch, min_loss,
                  best_epoch),
            daemon=True)
        self._thread.start()

    def save_params(self, path, params) -> None:
        host = jax.tree_util.tree_map(np.asarray, params)
        self.wait()
        self._thread = threading.Thread(target=self._run,
                                        args=(save_params, path, host),
                                        daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            # a silently dropped checkpoint/best-model write would report
            # success while losing data — fail the run instead
            err, self._error = self._error, None
            raise RuntimeError("background checkpoint write failed") from err

    def load(self, path, state):
        return load_checkpoint(path, state)

    def exists(self, path) -> bool:
        return os.path.exists(path)

    def close(self) -> None:
        self.wait()


def save_params(path, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_pack(params))
    os.replace(tmp, path)


def load_params(path, params_template):
    """Load a weights-only export. Dispatches on what exists on disk: a
    plain file is the msgpack format; a ``<path>.orbax`` directory is the
    sharded Orbax export (written when training ran with
    ``checkpoint_backend='orbax'``)."""
    if not os.path.exists(path) and os.path.isdir(
            os.path.abspath(path) + ".orbax"):
        return OrbaxCheckpointer().load_params(path, params_template)
    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(params_template, restored)


class OrbaxCheckpointer:
    """Sharded async checkpointing via Orbax (TPU-pod path).

    Same interface as ``AsyncCheckpointer`` so ``training`` can swap
    backends, but arrays are saved **per shard** (each host writes only
    its addressable shards, OCDBT/tensorstore format) and restored with
    their shardings — the multi-host-safe equivalent the msgpack backend
    (single-host, fully-replicated) cannot provide. SURVEY §5.4's
    'Orbax-style async sharded saves'.

    Layout: ``<path>.orbax/`` directory per checkpoint; metadata rides as
    a JSON item next to the state.
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())

    def _dir(self, path):
        return os.path.abspath(path) + ".orbax"

    def save(self, path, state, epoch, min_loss, best_epoch):
        ocp = self._ocp
        meta = {"epoch": int(epoch), "min_loss": float(min_loss),
                "best_epoch": -1 if best_epoch is None else int(best_epoch),
                "step": int(state.step)}
        from flax import serialization as ser
        self._ckptr.save(
            self._dir(path),
            args=ocp.args.Composite(
                state=ocp.args.PyTreeSave(ser.to_state_dict(state)),
                meta=ocp.args.JsonSave(meta)),
            force=True)

    def save_params(self, path, params):
        ocp = self._ocp
        self._ckptr.save(self._dir(path),
                         args=ocp.args.Composite(
                             state=ocp.args.PyTreeSave(params)),
                         force=True)

    def load(self, path, state):
        """Restore (state, epoch, min_loss, best_epoch); arrays come back
        with ``state``'s shardings."""
        ocp = self._ocp
        from flax import serialization as ser
        template = ser.to_state_dict(state)
        restored = self._ckptr.restore(
            self._dir(path),
            args=ocp.args.Composite(
                state=ocp.args.PyTreeRestore(
                    restore_args=self._ocp.checkpoint_utils.construct_restore_args(
                        template)),
                meta=ocp.args.JsonRestore()))
        meta = restored["meta"]
        state = ser.from_state_dict(state, restored["state"])
        best = None if meta["best_epoch"] < 0 else int(meta["best_epoch"])
        return state, int(meta["epoch"]), float(meta["min_loss"]), best

    def load_params(self, path, params_template):
        ocp = self._ocp
        restored = self._ckptr.restore(
            self._dir(path),
            args=ocp.args.Composite(
                state=ocp.args.PyTreeRestore(
                    restore_args=self._ocp.checkpoint_utils.construct_restore_args(
                        params_template))))
        return restored["state"]

    def exists(self, path):
        return os.path.isdir(self._dir(path))

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.close()


def make_checkpointer(backend: str = "msgpack"):
    """Checkpoint backend factory: 'msgpack' (single-host, replicated) or
    'orbax' (multi-host sharded async saves). Both expose save / load /
    save_params / exists / wait / close."""
    if backend == "msgpack":
        return AsyncCheckpointer()
    if backend == "orbax":
        return OrbaxCheckpointer()
    raise ValueError(f"unknown checkpoint backend: {backend!r} "
                     "(expected 'msgpack' or 'orbax')")
