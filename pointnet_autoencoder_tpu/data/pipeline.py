"""Host->device input pipeline.

The reference assembles batches serially between sess.run calls
(train.py:170-206: get_batch python loop, per-shape rotation, feed_dict) --
the device idles while the host decodes. Here batch assembly and
augmentation run on a background thread with a bounded prefetch queue, and
arrays are transferred with ``jax.device_put`` against an explicit sharding
(the TPU-native feed_dict), so step N+1's batch is on-device before step N
finishes.

Epoch semantics match the reference: fresh shuffle per train epoch,
``len(dataset) // batch_size`` full batches (remainder dropped,
train.py:187), per-shape Y-axis rotation unless disabled, eval unshuffled
and unrotated. The autoencoder's label *is* the augmented input
(train.py:202-204), so the pipeline yields a single (B, N, 3) array.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np

from pointnet_autoencoder_tpu.data.shapenet_part import rotate_point_cloud

_STOP = object()


class _ProducerError:
    """Carries a producer-thread exception to the consumer, which re-raises
    it -- a failed batch must fail the epoch, not silently truncate it."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class BatchPipeline:
    """Iterable over device-resident (B, N, 3) float32 batches."""

    def __init__(self, dataset, batch_size: int, rotate: bool = True,
                 shuffle: bool = True, sharding=None, seed: Optional[int] = None,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.rotate = rotate
        self.shuffle = shuffle
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def _assemble(self, idxs: np.ndarray) -> np.ndarray:
        n = self.dataset.npoints
        batch = np.empty((len(idxs), n, 3), dtype=np.float32)
        for j, idx in enumerate(idxs):
            pts, _ = self.dataset[int(idx)]
            batch[j] = pts
        if self.rotate:
            batch = rotate_point_cloud(batch, self._rng)
        return batch

    @staticmethod
    def _put_unless_stopped(q: queue.Queue, item, stop: threading.Event
                            ) -> bool:
        """Blocking put that aborts when the consumer abandons the epoch
        (early break / dropped iterator) instead of blocking forever on a
        full queue. Returns False if aborted."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _producer(self, order: np.ndarray, q: queue.Queue,
                  stop: threading.Event):
        try:
            for b in range(len(self)):
                idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                if not self._put_unless_stopped(q, self._assemble(idxs),
                                                stop):
                    return
            self._put_unless_stopped(q, _STOP, stop)
        except BaseException as e:  # delivered to the consumer, re-raised
            self._put_unless_stopped(q, _ProducerError(e), stop)

    def epochs(self) -> Iterator[Iterator[jax.Array]]:
        """Infinite iterator of epoch iterators."""
        while True:
            yield self.epoch()

    def epoch(self) -> Iterator[jax.Array]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        worker = threading.Thread(
            target=self._producer, args=(order, q, stop), daemon=True,
            name="pcae-pipeline-producer",
        )
        worker.start()
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    break
                if isinstance(item, _ProducerError):
                    raise item.exc
                if self.sharding is not None:
                    yield jax.device_put(item, self.sharding)
                else:
                    yield jax.device_put(item)
        finally:
            # Runs on exhaustion AND on early abandonment (generator close);
            # the stop event unblocks a producer waiting on a full queue.
            stop.set()
            worker.join(timeout=5.0)
