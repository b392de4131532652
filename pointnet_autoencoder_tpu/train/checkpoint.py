"""Checkpointing: orbax-backed, with the reference's two-tier policy.

Policy (train.py:160-168): save ``best_model_epoch_NNN`` whenever the eval
loss improves, overwrite ``model.ckpt`` every 10 epochs. Same directory
names, orbax format. Unlike the reference (which can only restore in
test.py), training is resumable: the checkpoint carries params, BN moving
stats, optimizer state, step, epoch, and best loss.
"""

from __future__ import annotations

import os
import re
import shutil
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


class CheckpointManager:
    def __init__(self, log_dir: str):
        self.log_dir = os.path.abspath(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    # -- save ---------------------------------------------------------------

    def _save(self, name: str, tree: Any) -> str:
        path = os.path.join(self.log_dir, name)
        # Write to a sibling temp dir first, swap in only once durable: a
        # crash mid-save must never leave the tier with NO checkpoint
        # (the periodic tier is overwritten every 10 epochs).
        tmp = path + ".saving"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, tree)
        self._ckpt.wait_until_finished()
        if os.path.exists(path):
            if not _is_orbax_checkpoint(path):
                raise ValueError(
                    f"refusing to overwrite {path}: it exists and does not "
                    "look like an orbax checkpoint"
                )
            shutil.rmtree(path)
        os.rename(tmp, path)
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
        if os.path.exists(path):
            if not _is_orbax_checkpoint(path):
                raise ValueError(
                    f"refusing to overwrite {path}: it exists and does not "
                    "look like an orbax checkpoint (no checkpoint metadata "
                    "marker). Delete it yourself or pick another path."
                )
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        self._ckpt.wait_until_finished()
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
            if os.path.isdir(path):
                return path
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
