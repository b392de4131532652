"""Device-resident input pipeline: the dataset lives in HBM.

The reference assembles every batch on the host (per-shape numpy resample +
rotation between sess.run calls, train.py:170-206), which on TPU leaves the
chip idle: the flagship train step takes ~0.4 ms while host-side assembly
takes several ms. Here the *entire decoded dataset* is uploaded to device
memory once (ShapeNetPart is ~100-600 MB -- a rounding error against HBM),
and per-step work -- shape gather, uniform resample-with-replacement,
random Y-rotation -- runs inside the jitted train step. Per step the host
transfers only a (B,) int32 index vector and a PRNG key.

Sampling semantics match the reference exactly (uniform with replacement
over each shape's true point count, fresh randomness every access,
per-shape rotation angle); only the RNG stream differs (JAX PRNG instead of
numpy legacy -- documented deviation, docs/ARCHITECTURE.md).

Variable shape lengths are handled by cyclic padding to the dataset max:
uniform indices are drawn in [0, true_length), so padding is never sampled.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset:
    """Uploads a PartDataset's decoded shapes to device memory.

    data:    (D, P_max, 3) float32, each shape cyclically padded.
    lengths: (D,) int32 true point counts.
    Both replicated across the mesh (every device needs random access).
    """

    def __init__(self, dataset, sharding=None, max_shapes: Optional[int] = None):
        shapes = []
        count = len(dataset) if max_shapes is None else min(
            len(dataset), max_shapes)
        for i in range(count):
            pts, _, _ = dataset._load(i)
            shapes.append(np.asarray(pts, np.float32))
        if not shapes:
            raise ValueError("empty dataset")
        lengths = np.array([len(s) for s in shapes], np.int32)
        p_max = int(lengths.max())
        data = np.empty((len(shapes), p_max, 3), np.float32)
        for i, s in enumerate(shapes):
            reps = -(-p_max // len(s))
            data[i] = np.tile(s, (reps, 1))[:p_max]

        if sharding is not None:
            self.data = jax.device_put(data, sharding)
            self.lengths = jax.device_put(lengths, sharding)
        else:
            self.data = jax.device_put(data)
            self.lengths = jax.device_put(lengths)
        self.num_shapes = len(shapes)
        # The decoded shapes now live in device memory; the upload loop
        # above filled the host dataset's item cache (hundreds of MB at
        # real-archive scale) that device mode never reads again. Drop it;
        # it refills lazily if a host-mode consumer shares the dataset.
        # (hasattr guard: this class only requires len/__getitem__, so
        # duck-typed datasets without an item cache are fine.)
        if hasattr(dataset, "drop_item_cache"):
            dataset.drop_item_cache()

    def nbytes(self) -> int:
        return self.data.size * 4 + self.lengths.size * 4


def assemble_batch(data: jax.Array, lengths: jax.Array, idxs: jax.Array,
                   key: jax.Array, num_point: int,
                   rotate: bool) -> jax.Array:
    """Jit-traceable batch assembly: gather shapes, resample with
    replacement to num_point, optional per-shape random Y-rotation.

    data (D,P,3), lengths (D,), idxs (B,) int32 -> (B, num_point, 3) f32.
    """
    pts = data[idxs]          # (B, P, 3)
    n = lengths[idxs]         # (B,)
    k_sel, k_rot = jax.random.split(key)
    u = jax.random.uniform(k_sel, (idxs.shape[0], num_point))
    sel = jnp.minimum((u * n[:, None]).astype(jnp.int32), n[:, None] - 1)
    batch = jnp.take_along_axis(pts, sel[:, :, None], axis=1)
    if rotate:
        angles = jax.random.uniform(
            k_rot, (idxs.shape[0],), minval=0.0, maxval=2.0 * jnp.pi
        )
        c, s = jnp.cos(angles), jnp.sin(angles)
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        rot = jnp.stack(
            [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
        ).reshape(-1, 3, 3)
        # HIGHEST: the TPU default lowers this K=3 f32 contraction to one
        # bf16 MXU pass (~3e-2 coordinate error vs the host rotation path,
        # measured); exact rotation costs nothing at K=3.
        batch = jnp.einsum("bnc,bcd->bnd", batch, rot,
                           precision=jax.lax.Precision.HIGHEST)
    return batch


class DeviceBatchIterator:
    """Epoch iterator yielding (idxs, key) pairs; the actual batch is built
    on-device inside the jitted step via ``assemble_batch``."""

    def __init__(self, num_shapes: int, batch_size: int, shuffle: bool,
                 seed: int = 0):
        self.num_shapes = num_shapes
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

    def __len__(self) -> int:
        return self.num_shapes // self.batch_size

    def epoch(self) -> "Tuple[np.ndarray, jax.Array]":
        order = np.arange(self.num_shapes)
        if self.shuffle:
            self._rng.shuffle(order)
        for b in range(len(self)):
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            self._key, sub = jax.random.split(self._key)
            yield jnp.asarray(idxs, jnp.int32), sub

    def epoch_chunks(self, chunk: int) -> "Tuple[np.ndarray, jax.Array]":
        """Epoch as (K, B) index chunks + one key per chunk, for multi-step
        scan dispatch (train/loop.py): every device call to the tunneled
        backend costs a host RPC (measured ~3-10 ms each, vs the 2.7 ms
        device step), so the Trainer runs ``chunk`` train steps per dispatch
        under one lax.scan. The last chunk carries the epoch tail
        (len % chunk batches). Chunk keys are split once per chunk here;
        per-step keys are derived inside the jitted scan."""
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        order = np.arange(self.num_shapes)
        if self.shuffle:
            self._rng.shuffle(order)
        n = len(self)
        for c0 in range(0, n, chunk):
            k = min(chunk, n - c0)
            idxs = order[c0 * self.batch_size:(c0 + k) * self.batch_size]
            self._key, sub = jax.random.split(self._key)
            yield (idxs.reshape(k, self.batch_size).astype(np.int32), sub)
