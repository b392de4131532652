"""Data layer tests: loader semantics, fast native IO, pipeline, fixture.

Covers the reference loader's observable behavior (part_dataset.py): split
selection, category filtering, normalization, resample-with-replacement,
caching, rotation augmentation -- against the synthetic on-disk fixture
(SURVEY.md section 4 item 6).
"""

import os

import numpy as np
import pytest

from pointnet_autoencoder_tpu.data import fastio, synthetic
from pointnet_autoencoder_tpu.data.pipeline import BatchPipeline
from pointnet_autoencoder_tpu.data.shapenet_part import (
    PartDataset,
    pc_normalize,
    rotate_point_cloud,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_fixture")
    return synthetic.write_fixture(str(root), shapes_per_category=12,
                                  points_per_shape=96, seed=0)


def test_fixture_layout(fixture_root):
    assert os.path.exists(os.path.join(fixture_root,
                                       "synsetoffset2category.txt"))
    assert os.path.exists(os.path.join(
        fixture_root, "train_test_split", "shuffled_train_file_list.json"))


def test_splits_partition_dataset(fixture_root):
    sizes = {s: len(PartDataset(fixture_root, npoints=32, split=s))
             for s in ("train", "val", "test", "trainval")}
    assert sizes["trainval"] == sizes["train"] + sizes["val"]
    assert sizes["train"] + sizes["val"] + sizes["test"] == 36
    assert sizes["test"] > 0


def test_class_choice_filters(fixture_root):
    all_ds = PartDataset(fixture_root, npoints=32, split="trainval")
    chair = PartDataset(fixture_root, npoints=32, split="trainval",
                        class_choice=["Chair"])
    assert 0 < len(chair) < len(all_ds)
    with pytest.raises(ValueError):
        PartDataset(fixture_root, npoints=32, class_choice=["NotACategory"])


def test_getitem_contract(fixture_root):
    ds = PartDataset(fixture_root, npoints=48, split="train", seed=1)
    pts, seg = ds[0]
    assert pts.shape == (48, 3) and pts.dtype == np.float32
    assert seg.shape == (48,) and seg.dtype == np.int64
    assert seg.min() >= 0  # on-disk labels are 1-based; loader shifts to 0
    # Normalized into the unit sphere.
    assert np.max(np.linalg.norm(pts - pts.mean(0), axis=1)) <= 1.5
    # Fresh resample every access (with-replacement randomness).
    pts2, _ = ds[0]
    assert not np.array_equal(pts, pts2)


def test_empty_split_is_usable(tmp_path):
    """A valid category whose chosen split has no shapes must yield an empty
    dataset (len 0, num_seg_classes 0) instead of an IndexError from the
    2% seg-class scan (reference part_dataset.py:94-98 scans zero files)."""
    root = synthetic.write_fixture(str(tmp_path / "tiny"),
                                   shapes_per_category=2,
                                   points_per_shape=16, seed=0)
    ds = PartDataset(root, npoints=8, split="val")  # both shapes -> train
    assert len(ds) == 0
    assert ds.num_seg_classes == 0


def test_missing_dataset_root_helpful_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="data_path|fixture"):
        PartDataset(str(tmp_path / "nope"), npoints=8)


def test_normalize_false_preserves_raw_coordinates(fixture_root):
    raw = PartDataset(fixture_root, npoints=32, split="train",
                      normalize=False, seed=0)
    pts, _, _ = raw._load(0)
    # Fixture shapes have anisotropic scale up to 1.5 + jitter: without
    # normalization, norms exceed the unit sphere.
    assert np.max(np.linalg.norm(pts - pts.mean(0), axis=1)) != pytest.approx(
        1.0, rel=1e-3
    )


def test_classification_mode(fixture_root):
    ds = PartDataset(fixture_root, npoints=16, split="train",
                     classification=True)
    pts, cls = ds[0]
    assert cls.shape == (1,) and cls.dtype == np.int32


def test_pc_normalize():
    rng = np.random.RandomState(0)
    pc = rng.randn(100, 3) * 7 + 3
    out = pc_normalize(pc)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-6)
    np.testing.assert_allclose(np.max(np.linalg.norm(out, axis=1)), 1.0,
                               rtol=1e-6)


def test_rotation_preserves_norms_and_y():
    rng = np.random.RandomState(0)
    batch = rng.randn(4, 50, 3).astype(np.float32)
    rot = rotate_point_cloud(batch, np.random.default_rng(0))
    # Y (up axis) unchanged; xz-norm preserved per point.
    np.testing.assert_allclose(rot[..., 1], batch[..., 1], atol=1e-5)
    np.testing.assert_allclose(
        np.hypot(rot[..., 0], rot[..., 2]),
        np.hypot(batch[..., 0], batch[..., 2]), atol=1e-4,
    )
    # Different shapes get different angles.
    a0 = rot[0] - batch[0]
    a1 = rot[1] - batch[1]
    assert not np.allclose(a0, a1)


def test_native_fastio_matches_numpy(fixture_root, tmp_path):
    if not fastio.native_available():
        pytest.skip("native fastio not built")
    ds = PartDataset(fixture_root, npoints=16, split="train")
    _, pts_path, seg_path = ds.datapath[0]
    np.testing.assert_allclose(
        fastio.load_pts(pts_path),
        np.loadtxt(pts_path).astype(np.float32).reshape(-1, 3), rtol=1e-6,
    )
    np.testing.assert_array_equal(
        fastio.load_seg(seg_path), np.loadtxt(seg_path).astype(np.int64)
    )
    # Robustness probes: blank lines, trailing whitespace, scientific notation.
    p = tmp_path / "odd.pts"
    p.write_text("1.0 2.0 3e-1\n\n  4.5\t5.5 6.5  \n")
    np.testing.assert_allclose(
        fastio.load_pts(str(p)),
        np.array([[1.0, 2.0, 0.3], [4.5, 5.5, 6.5]], np.float32),
    )


def test_pipeline_batches(fixture_root):
    ds = PartDataset(fixture_root, npoints=32, split="trainval", seed=0)
    pipe = BatchPipeline(ds, batch_size=8, rotate=True, seed=0)
    batches = list(pipe.epoch())
    assert len(batches) == len(ds) // 8 == len(pipe)
    assert all(b.shape == (8, 32, 3) for b in batches)
    assert str(batches[0].dtype) == "float32"
    # Shuffle differs between epochs.
    b2 = list(pipe.epoch())
    assert not np.allclose(np.asarray(batches[0]), np.asarray(b2[0]))


def test_pipeline_eval_mode_deterministic_order(fixture_root):
    ds = PartDataset(fixture_root, npoints=32, split="test", seed=7)
    pipe = BatchPipeline(ds, batch_size=4, rotate=False, shuffle=False)
    n1 = list(pipe.epoch())
    assert len(n1) == len(ds) // 4


def test_pipeline_propagates_producer_errors(fixture_root):
    """A batch that fails to assemble must fail the epoch in the consumer,
    not silently truncate it (one corrupt shape file would otherwise
    shrink every epoch without any error)."""
    import pytest

    ds = PartDataset(fixture_root, npoints=32, split="trainval", seed=0)

    class Exploding:
        npoints = ds.npoints

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i >= 8:
                raise IOError("corrupt shape")
            return ds[i]

    pipe = BatchPipeline(Exploding(), batch_size=8, shuffle=False,
                         rotate=False)
    it = pipe.epoch()
    next(it)  # first batch (indices 0..7) assembles fine
    with pytest.raises(IOError, match="corrupt shape"):
        for _ in it:
            pass


def test_load_pts_rejects_wrong_column_count(tmp_path):
    """A 6-column .pts (e.g. with normals) must error loudly, not be
    reinterpreted as interleaved fake points."""
    import pytest

    from pointnet_autoencoder_tpu.data import fastio

    p = tmp_path / "normals.pts"
    p.write_text("1 2 3 0.1 0.2 0.3\n4 5 6 0.4 0.5 0.6\n")
    with pytest.raises(ValueError, match="expected 3 columns, found 6"):
        fastio.load_pts(str(p))
    # And regardless of whether the native library is loaded.
    lib = fastio._LIB
    try:
        fastio._LIB = None
        with pytest.raises(ValueError, match="expected 3 columns"):
            fastio.load_pts(str(p))
    finally:
        fastio._LIB = lib


def test_load_seg_rejects_wrong_column_count(tmp_path):
    """A multi-column label file (e.g. label + confidence) must error
    loudly: the native path would otherwise consume the first N tokens —
    silently mislabeling every point past row N/2."""
    import pytest

    from pointnet_autoencoder_tpu.data import fastio

    p = tmp_path / "twocol.seg"
    p.write_text("1 0.9\n2 0.8\n")
    with pytest.raises(ValueError, match="expected 1 columns, found 2"):
        fastio.load_seg(str(p))
    lib = fastio._LIB
    try:
        fastio._LIB = None
        with pytest.raises(ValueError, match="expected 1 columns"):
            fastio.load_seg(str(p))
    finally:
        fastio._LIB = lib


def test_disk_cache_round_trip(fixture_root, tmp_path):
    """cache_dir writes .npz entries on first decode and serves identical
    (points, seg) from them afterwards ([new] — the reference re-runs
    np.loadtxt each process start, part_dataset.py:110-113)."""
    cache = str(tmp_path / "cache")
    cold = PartDataset(fixture_root, npoints=32, split="train", seed=0,
                       cache_dir=cache)
    ref = PartDataset(fixture_root, npoints=32, split="train", seed=0)
    pts_a, seg_a, _ = cold._load(0)
    entries = os.listdir(cache)
    assert len(entries) == 1 and entries[0].endswith(".npz")
    # A fresh dataset sharing the cache dir must hit the cache and produce
    # byte-identical items.
    warm = PartDataset(fixture_root, npoints=32, split="train", seed=0,
                       cache_dir=cache)
    pts_b, seg_b, _ = warm._load(0)
    pts_r, seg_r, _ = ref._load(0)
    np.testing.assert_array_equal(pts_a, pts_b)
    np.testing.assert_array_equal(seg_a, seg_b)
    np.testing.assert_array_equal(pts_a, pts_r)
    np.testing.assert_array_equal(seg_a, seg_r)


def test_disk_cache_invalidated_by_source_mtime(tmp_path):
    """Touching the source .pts newer than its cache entry forces a
    re-decode (entries key on mtime, not content hash). Uses a private
    fixture because the test rewrites a source file."""
    root = synthetic.write_fixture(str(tmp_path / "fix"),
                                   shapes_per_category=2,
                                   points_per_shape=16, seed=0)
    cache = str(tmp_path / "cache")
    ds = PartDataset(root, npoints=8, split="train", seed=0,
                     cache_dir=cache)
    _, pts_path, seg_path = ds.datapath[0]
    ds._load(0)
    cpath = ds._disk_cache_path(pts_path)
    assert os.path.exists(cpath)
    # Rewrite the source with different content, mtime in the future of
    # the cache entry.
    with open(pts_path, "w") as f:
        f.write("9 9 9\n8 8 8\n")
    future = os.path.getmtime(cpath) + 10
    os.utime(pts_path, (future, future))
    ds2 = PartDataset(root, npoints=8, split="train", seed=0,
                      cache_dir=cache)
    pts, _ = ds2._decode(pts_path, seg_path)
    assert pts.shape[0] == 2 and pts[0, 0] == 9.0


def test_disk_cache_keys_on_source_path(tmp_path):
    """Two dataset roots sharing one cache_dir reuse synset/token file
    names; entries must key on the source path so dataset B never gets
    served dataset A's cached points (an mtime-only check passes whenever
    A was cached after B's files were written)."""
    root_a = synthetic.write_fixture(str(tmp_path / "a"),
                                     shapes_per_category=2,
                                     points_per_shape=16, seed=1)
    root_b = synthetic.write_fixture(str(tmp_path / "b"),
                                     shapes_per_category=2,
                                     points_per_shape=16, seed=2)
    cache = str(tmp_path / "cache")
    ds_a = PartDataset(root_a, npoints=8, split="train", seed=0,
                       cache_dir=cache)
    ds_b = PartDataset(root_b, npoints=8, split="train", seed=0,
                       cache_dir=cache)
    _, pa, sa = ds_a.datapath[0]
    _, pb, sb = ds_b.datapath[0]
    assert os.path.basename(pa) == os.path.basename(pb)  # names collide
    pts_a, _ = ds_a._decode(pa, sa)  # caches A first
    # Make A's cache entry newer than B's sources (the collision setup).
    future = os.path.getmtime(pb) + 10
    os.utime(ds_a._disk_cache_path(pa), (future, future))
    pts_b, _ = ds_b._decode(pb, sb)
    ref_b = PartDataset(root_b, npoints=8, split="train", seed=0)
    pts_ref, _ = ref_b._decode(pb, sb)
    np.testing.assert_array_equal(pts_b, pts_ref)
    assert not np.array_equal(pts_a, pts_b)


def test_disk_cache_corrupt_entry_falls_through(fixture_root, tmp_path):
    """A torn/corrupt cache file must be silently re-decoded from source,
    never crash the loader."""
    cache = str(tmp_path / "cache")
    ds = PartDataset(fixture_root, npoints=32, split="train", seed=0,
                     cache_dir=cache)
    _, pts_path, seg_path = ds.datapath[0]
    pts_good, seg_good = ds._decode(pts_path, seg_path)
    cpath = ds._disk_cache_path(pts_path)
    with open(cpath, "wb") as f:
        f.write(b"not an npz")
    os.utime(cpath, None)  # keep it "fresh" so only content is bad
    pts, seg = ds._decode(pts_path, seg_path)
    np.testing.assert_array_equal(pts, pts_good)
    np.testing.assert_array_equal(seg, seg_good)


def test_cache_dir_cli_flag_reaches_config():
    from pointnet_autoencoder_tpu.cli.train import (
        build_parser,
        config_from_args,
    )

    args = build_parser().parse_args(["--cache_dir", "/tmp/c"])
    assert config_from_args(args).cache_dir == "/tmp/c"
    assert config_from_args(build_parser().parse_args([])).cache_dir is None


def test_pipeline_abandoned_epoch_stops_producer(fixture_root):
    """Consuming one batch and dropping the iterator must not strand the
    producer thread blocked on the bounded prefetch queue."""
    import threading
    import time

    ds = PartDataset(fixture_root, npoints=32, split="trainval", seed=0)
    pipe = BatchPipeline(ds, batch_size=1, prefetch=1, seed=0)
    assert len(pipe) > 3  # enough batches that the producer must block
    it = pipe.epoch()
    next(it)
    it.close()  # runs the generator's finally: sets stop + joins
    deadline = time.monotonic() + 3.0
    while time.monotonic() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "pcae-pipeline-producer" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, "producer thread still alive after epoch abandonment"
