"""Text logging and scalar metrics.

Reference observability (SURVEY.md section 5): a text log mirrored to
LOG_DIR/log_train.txt (train.py:69-72) and TF scalar summaries. Here:
same text log, plus scalars appended to LOG_DIR/scalars.jsonl (one JSON
object per record -- trivially plottable, no TF dependency) and, when the
optional tensorboardX/torch writer is importable, TensorBoard event files
in LOG_DIR/{train,test} like the reference's FileWriters.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, log_dir: str, filename: str = "log_train.txt",
                 echo: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._fh = open(os.path.join(log_dir, filename), "a")
        self._scalars = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self.echo = echo
        self._tb = {}
        try:  # optional TensorBoard writers (train/ and test/ subdirs)
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            for split in ("train", "test"):
                self._tb[split] = SummaryWriter(os.path.join(log_dir, split))
        except Exception:
            self._tb = {}

    def log(self, msg: str) -> None:
        self._fh.write(msg + "\n")
        self._fh.flush()
        if self.echo:
            print(msg)
            sys.stdout.flush()

    def scalars(self, split: str, step: int,
                values: Dict[str, float]) -> None:
        rec = {"split": split, "step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._scalars.write(json.dumps(rec) + "\n")
        self._scalars.flush()
        writer = self._tb.get(split)
        if writer is not None:
            for k, v in values.items():
                writer.add_scalar(k, float(v), int(step))

    def flush(self) -> None:
        """Make everything logged so far durable without closing: the text
        and scalars files flush on every write; TensorBoard writers buffer
        (up to ~2 min of events) and are the reason this exists."""
        for w in self._tb.values():
            w.flush()

    def close(self) -> None:
        if self._fh.closed:  # idempotent
            return
        self._fh.close()
        self._scalars.close()
        for w in self._tb.values():
            w.close()


def snapshot_config(log_dir: str, config) -> None:
    """Record the exact run configuration and model source (the reference
    snapshots the model file and train.py into LOG_DIR, train.py:52-53)."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "config.json"), "w") as f:
        f.write(config.to_json())
    try:
        import shutil

        from pointnet_autoencoder_tpu.models import autoencoder, registry
        from pointnet_autoencoder_tpu.train import loop

        snap = os.path.join(log_dir, "source_snapshot")
        os.makedirs(snap, exist_ok=True)
        for mod in (autoencoder, registry, loop):
            shutil.copy2(mod.__file__, snap)
    except Exception:
        pass  # snapshotting is best-effort; never block training
