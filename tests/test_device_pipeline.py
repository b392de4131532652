"""Device-resident pipeline tests: padding, sampling, rotation, iterator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_autoencoder_tpu.data import synthetic
from pointnet_autoencoder_tpu.data.device_pipeline import (
    DeviceBatchIterator,
    DeviceDataset,
    assemble_batch,
)
from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fix")
    synthetic.write_fixture(str(root), shapes_per_category=12,
                            points_per_shape=50, seed=0)
    return PartDataset(str(root), npoints=32, split="trainval", seed=0)


def test_device_dataset_upload_and_cyclic_padding(dataset):
    dd = DeviceDataset(dataset)
    assert dd.num_shapes == len(dataset)
    data = np.asarray(dd.data)
    lengths = np.asarray(dd.lengths)
    assert data.shape[0] == len(dataset) and data.shape[2] == 3
    # Cyclic padding: row length_i + k equals row k.
    i = 0
    n = lengths[i]
    if data.shape[1] > n:
        np.testing.assert_array_equal(data[i, n], data[i, 0])
    # True content matches the decoded shape.
    pts, _, _ = dataset._load(i)
    np.testing.assert_allclose(data[i, :n], pts, rtol=1e-6)


def test_assemble_batch_samples_only_real_points(dataset):
    dd = DeviceDataset(dataset)
    idxs = jnp.asarray([0, 1, 2, 3], jnp.int32)
    batch = assemble_batch(dd.data, dd.lengths, idxs, jax.random.PRNGKey(0),
                           num_point=64, rotate=False)
    assert batch.shape == (4, 64, 3)
    # Every sampled point must be one of the shape's true points.
    data = np.asarray(dd.data)
    lengths = np.asarray(dd.lengths)
    for b, i in enumerate(np.asarray(idxs)):
        real = data[i, :lengths[i]]
        got = np.asarray(batch[b])
        dists = ((got[:, None, :] - real[None, :, :]) ** 2).sum(-1).min(1)
        assert dists.max() < 1e-10


def test_assemble_batch_fresh_randomness(dataset):
    dd = DeviceDataset(dataset)
    idxs = jnp.zeros((2,), jnp.int32)
    b1 = assemble_batch(dd.data, dd.lengths, idxs, jax.random.PRNGKey(1),
                        num_point=32, rotate=False)
    b2 = assemble_batch(dd.data, dd.lengths, idxs, jax.random.PRNGKey(2),
                        num_point=32, rotate=False)
    assert not np.allclose(np.asarray(b1), np.asarray(b2))


def test_assemble_batch_rotation_semantics(dataset):
    dd = DeviceDataset(dataset)
    idxs = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(3)
    plain = assemble_batch(dd.data, dd.lengths, idxs, key, 32, rotate=False)
    rot = assemble_batch(dd.data, dd.lengths, idxs, key, 32, rotate=True)
    # Same selection key -> same points; rotation about Y preserves the up
    # axis and the xz radius.
    np.testing.assert_allclose(np.asarray(rot[..., 1]),
                               np.asarray(plain[..., 1]), atol=1e-5)
    np.testing.assert_allclose(
        np.hypot(np.asarray(rot[..., 0]), np.asarray(rot[..., 2])),
        np.hypot(np.asarray(plain[..., 0]), np.asarray(plain[..., 2])),
        atol=1e-4,
    )


def test_iterator_epochs(dataset):
    it = DeviceBatchIterator(20, batch_size=8, shuffle=True, seed=0)
    items = list(it.epoch())
    assert len(items) == len(it) == 2
    idxs, key = items[0]
    assert idxs.shape == (8,) and idxs.dtype == jnp.int32
    # Shuffle differs across epochs; all indices in range.
    items2 = list(it.epoch())
    assert not np.array_equal(np.asarray(items[0][0]),
                              np.asarray(items2[0][0]))
    all_idx = np.concatenate([np.asarray(i) for i, _ in items])
    assert all_idx.min() >= 0 and all_idx.max() < 20


def test_epoch_chunks_cover_epoch_with_tail():
    """epoch_chunks((K,B) scan batches): covers exactly len(it) batches in
    order, full chunks of `chunk` plus one tail, unique keys per chunk,
    and a deterministic restart under the same seed."""
    import pytest

    it = DeviceBatchIterator(8 * 7, batch_size=8, shuffle=True, seed=3)
    chunks = list(it.epoch_chunks(3))
    sizes = [idxs.shape[0] for idxs, _ in chunks]
    assert sizes == [3, 3, 1]  # 7 batches -> 3 + 3 + tail 1
    for idxs, _ in chunks:
        assert idxs.shape[1:] == (8,) and idxs.dtype == np.int32
    flat = np.concatenate([i.reshape(-1) for i, _ in chunks])
    assert sorted(flat.tolist()) == list(range(56))  # a full permutation
    keys = [np.asarray(k).tolist() for _, k in chunks]
    assert len({tuple(k) for k in keys}) == len(keys)

    it2 = DeviceBatchIterator(8 * 7, batch_size=8, shuffle=True, seed=3)
    chunks2 = list(it2.epoch_chunks(3))
    for (a, ka), (b, kb) in zip(chunks, chunks2):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))

    with pytest.raises(ValueError):
        next(it.epoch_chunks(0))


def test_device_dataset_accepts_duck_typed_dataset():
    """DeviceDataset's contract is len() + _load(); a dataset without an
    in-RAM item cache (no drop_item_cache method) must upload fine — the
    cache eviction is a guarded optimization, not a requirement."""

    class Tiny:
        def __len__(self):
            return 3

        def _load(self, i):
            return np.full((4 + i, 3), float(i), np.float32), None, None

    dd = DeviceDataset(Tiny())
    assert dd.num_shapes == 3
    assert np.asarray(dd.lengths).tolist() == [4, 5, 6]
