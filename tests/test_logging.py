"""Logger behavior: file outputs, flush-without-close, idempotent close.

The Trainer's re-train contract (train() flushes, close() is the explicit
teardown) leans on these semantics — see tests/test_train.py's
test_trainer_retrainable_after_train for the integration side.
"""

import json
import os

from pointnet_autoencoder_tpu.train.logging import Logger


def test_logger_writes_text_and_scalars(tmp_path):
    log = Logger(str(tmp_path), echo=False)
    log.log("hello world")
    log.scalars("train", 7, {"loss": 1.5, "pcloss": 0.25})
    # Text and scalars flush on every write (no close needed to read).
    with open(tmp_path / "log_train.txt") as f:
        assert "hello world" in f.read()
    with open(tmp_path / "scalars.jsonl") as f:
        rec = json.loads(f.read().strip())
    assert rec["split"] == "train" and rec["step"] == 7
    assert rec["loss"] == 1.5 and rec["pcloss"] == 0.25
    assert "time" in rec
    log.close()


def test_logger_flush_keeps_logger_usable(tmp_path):
    """flush() makes buffered sinks durable WITHOUT closing: logging must
    keep working afterwards (train() flushes on every exit; a closed
    logger there broke in-process re-training)."""
    log = Logger(str(tmp_path), echo=False)
    log.log("before flush")
    log.flush()
    log.log("after flush")
    log.scalars("test", 1, {"loss": 0.5})
    with open(tmp_path / "log_train.txt") as f:
        text = f.read()
    assert "before flush" in text and "after flush" in text
    log.close()


def test_logger_close_is_idempotent(tmp_path):
    log = Logger(str(tmp_path), echo=False)
    log.log("x")
    log.close()
    log.close()  # second close must be a no-op, not ValueError
