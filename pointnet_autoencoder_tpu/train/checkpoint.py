"""Checkpointing: orbax-backed, with the reference's two-tier policy.

Policy (train.py:160-168): save ``best_model_epoch_NNN`` whenever the eval
loss improves, overwrite ``model.ckpt`` every 10 epochs. Same directory
names, orbax format. Unlike the reference (which can only restore in
test.py), training is resumable: the checkpoint carries params, BN moving
stats, optimizer state, step, epoch, and best loss.
"""

from __future__ import annotations

import os
import queue
import re
import shutil
import threading
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


# Marker files orbax writes at a checkpoint root (any is sufficient; the
# set covers current and older orbax layouts). Deliberately does NOT
# include TF-Saver's "checkpoint" protocol file: a reference-stack TF log
# directory is exactly the kind of unrelated precious data the guard must
# refuse to delete.
_ORBAX_MARKERS = ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt")


def _is_orbax_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and any(
        os.path.exists(os.path.join(path, m)) for m in _ORBAX_MARKERS
    )


def _swap_in(tmp: str, path: str) -> None:
    """Replace ``path`` with the finished checkpoint at ``tmp`` without a
    window in which no complete checkpoint exists under a durable name:
    the old checkpoint is renamed aside (atomic) rather than deleted
    first, so a crash at any instant leaves a complete checkpoint at
    ``path``, ``path + '.old'``, or ``tmp`` — and ``latest()`` knows to
    fall back to the siblings."""
    old = path + ".old"
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


class CheckpointManager:
    def __init__(self, log_dir: str):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------

    def _save(self, name: str, tree: Any) -> str:
        path = os.path.join(self.log_dir, name)
        # Refuse before doing any work: writing the full state to the temp
        # dir first would waste a multi-second serialize on a save that is
        # about to be refused (and strand the temp dir).
        if os.path.exists(path) and not _is_orbax_checkpoint(path):
            raise ValueError(
                f"refusing to overwrite {path}: it exists and does not "
                "look like an orbax checkpoint"
            )
        # Write to a sibling temp dir first, swap in only once durable: a
        # crash mid-save must never leave the tier with NO checkpoint
        # (the periodic tier is overwritten every 10 epochs).
        tmp = path + ".saving"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, tree)
        self._ckpt.wait_until_finished()
        if os.path.exists(path) and not _is_orbax_checkpoint(path):
            raise ValueError(  # re-check: the slow write above is a window
                f"refusing to overwrite {path}: it exists and does not "
                "look like an orbax checkpoint"
            )
        _swap_in(tmp, path)
        # Pointer to the most recently written checkpoint, so resume picks
        # the newest regardless of which policy tier wrote it.
        with open(os.path.join(self.log_dir, "LATEST"), "w") as f:
            f.write(name)
        return path

    def save_best(self, epoch: int, tree: Any) -> str:
        return self._save(f"best_model_epoch_{epoch:03d}.ckpt", tree)

    def save_periodic(self, tree: Any) -> str:
        return self._save("model.ckpt", tree)

    def save_tree(self, path: str, tree: Any) -> str:
        """Save an arbitrary pytree at an absolute/relative path (outside
        the two-tier policy; used for serving bundles).

        Refuses to overwrite a pre-existing path that is not itself an
        orbax checkpoint, so a mistyped destination (e.g. --out in
        cli.export pointing at an unrelated directory) cannot delete it."""
        path = os.path.abspath(path)
        if os.path.exists(path) and not _is_orbax_checkpoint(path):
            raise ValueError(
                f"refusing to overwrite {path}: it exists and does not "
                "look like an orbax checkpoint (no checkpoint metadata "
                "marker). Delete it yourself or pick another path."
            )
        # Same atomicity as _save: write beside, swap in once durable, so
        # a crash mid-write cannot destroy the pre-existing checkpoint.
        tmp = path + ".saving"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, tree)
        self._ckpt.wait_until_finished()
        _swap_in(tmp, path)
        return path

    # -- restore ------------------------------------------------------------

    def restore(self, path: str, abstract_tree: Any) -> Any:
        """Restore a checkpoint given a matching abstract pytree (shapes and
        dtypes; build one with ``jax.eval_shape`` or from a fresh state)."""
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_tree
        )
        return self._ckpt.restore(os.path.abspath(path), abstract)

    def latest(self) -> Optional[str]:
        """Most recently *written* checkpoint in log_dir (via the LATEST
        pointer); falls back to the highest-numbered best_model_epoch_*,
        then model.ckpt, for directories written by older runs."""
        pointer = os.path.join(self.log_dir, "LATEST")
        if os.path.exists(pointer):
            with open(pointer) as f:
                path = os.path.join(self.log_dir, f.read().strip())
            # A crash mid-swap (_swap_in) can leave the pointed name
            # briefly absent while a complete checkpoint sits at the
            # rename-aside or temp sibling; resume from those rather than
            # discarding the run.
            for candidate in (path, path + ".old", path + ".saving"):
                if _is_orbax_checkpoint(candidate):
                    return candidate
        best = -1
        best_path = None
        if os.path.isdir(self.log_dir):
            for entry in os.listdir(self.log_dir):
                m = re.fullmatch(r"best_model_epoch_(\d+)\.ckpt", entry)
                if m and int(m.group(1)) > best:
                    best = int(m.group(1))
                    best_path = os.path.join(self.log_dir, entry)
        if best_path is not None:
            return best_path
        periodic = os.path.join(self.log_dir, "model.ckpt")
        return periodic if os.path.isdir(periodic) else None

    def close(self):
        self._ckpt.close()


class AsyncSaver:
    """Background checkpoint writer: device→host fetch + orbax write off
    the training thread.

    Motivation (measured; docs/ARCHITECTURE.md round-3 entry): a
    synchronous save costs ~4.7 s on the tunneled dev backend — ~2.6 s
    device→host transfer of the ~103 MB train state at the link's
    ~30 MB/s, plus the orbax write — and the reference's
    best-on-improvement policy (train.py:160-168) fires on ~1/4 of
    epochs, making checkpointing ~half of an end-to-end schedule's wall.
    The training thread instead snapshots the state *on device* (a sub-ms
    HBM copy, so later donated train steps cannot alias the saved
    buffers) and hands it here; the transfer streams while the device
    trains the next epochs.

    One worker thread ⇒ saves complete in submit order, so the LATEST
    pointer written by ``CheckpointManager._save`` stays the most recent
    checkpoint. The queue is bounded: at most two snapshots (~200 MB of
    HBM for the flagship state) are in flight and ``submit`` blocks when
    full. Worker exceptions re-raise on the training thread at the next
    submit/flush/close — a failed checkpoint must fail the run, not
    vanish silently."""

    def __init__(self, manager: CheckpointManager, log=None):
        self._mgr = manager
        self._log = log
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="ckpt-saver"
        )
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                kind, epoch, tree = item
                tree = jax.device_get(tree)
                if kind == "best":
                    path = self._mgr.save_best(epoch, tree)
                else:
                    path = self._mgr.save_periodic(tree)
                if self._log is not None:
                    self._log(f"Model saved in file: {path}")
            except BaseException as e:  # noqa: BLE001 — surfaced on train thread
                self._error = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint save failed") from err

    def submit(self, kind: str, epoch: int, tree: Any) -> None:
        """Enqueue a save of ``tree`` (device arrays are fetched on the
        worker; pass an on-device snapshot the training loop will not
        donate). ``kind`` is 'best' or 'periodic'."""
        self._check()
        self._q.put((kind, epoch, tree))

    def flush(self) -> None:
        """Block until every submitted save is durable on disk."""
        self._q.join()
        self._check()

    def close(self) -> None:
        self.flush()
        self._q.put(None)
        self._thread.join()
