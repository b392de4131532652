"""Profiling and timing utilities.

The reference has no profiler integration -- only wall-clock prints in
embedded benchmarks (SURVEY.md section 5). Here: a step timer with
percentile summaries for the training loop, and a thin wrapper over
``jax.profiler`` tracing (viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


class StepTimer:
    """Wall-clock timer for jitted steps. ``block=True`` synchronizes on the
    device result, so timings reflect device completion, not dispatch.

    The barrier is ``block_until_ready`` plus a one-element host fetch of
    the first array leaf: on the axon-tunneled backend used for
    development, ``block_until_ready`` alone returns at dispatch time
    (CLAUDE.md gotchas) and only a host fetch proves device completion.
    The fetch moves a single element, not the whole result tree."""

    def __init__(self, max_records: int = 10000):
        self._times: List[float] = []
        self._max = max_records
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    @staticmethod
    def _barrier(result) -> None:
        jax.block_until_ready(result)
        for leaf in jax.tree_util.tree_leaves(result):
            if hasattr(leaf, "ndim"):
                flat = leaf.reshape(-1) if leaf.ndim else leaf
                np.asarray(flat[0] if leaf.ndim else flat)  # host fetch
                return

    def stop(self, result=None, block: bool = True) -> float:
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() without a matching start()")
        if result is not None and block:
            self._barrier(result)
        dt = time.perf_counter() - self._t0
        if len(self._times) < self._max:
            self._times.append(dt)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def step(self, block: bool = True):
        self.start()
        box = {}
        try:
            yield box
        finally:
            self.stop(box.get("result"), block=block)

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p90_ms": float(np.percentile(arr, 90) * 1e3),
            "p99_ms": float(np.percentile(arr, 99) * 1e3),
        }

    def reset(self) -> None:
        self._times.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
