"""ShapeNetPart v0 dataset: the equivalent of the reference's part_dataset.py.

Same on-disk layout and observable behavior (SURVEY.md P2):

- category map read from ``synsetoffset2category.txt`` (part_dataset.py:45-54)
- official shuffled train/val/test splits from
  ``train_test_split/shuffled_*_file_list.json`` (part_dataset.py:59-64)
- per-shape ``.pts`` xyz and ``.seg`` label files
- unit-sphere normalization (part_dataset.py:12-19)
- random resample *with replacement* to ``npoints`` on every access, fresh
  randomness even on cache hits (part_dataset.py:118-121)
- in-RAM cache of up to 18000 decoded shapes (part_dataset.py:100-101)
- per-shape random rotation about the up (Y) axis for augmentation
  (part_dataset.py:21-39)

Differences by design: text parsing goes through a native C++ parser when
available (pointnet_autoencoder_tpu/csrc) -- np.loadtxt is the reference's
single biggest host-side cost -- with a numpy fallback; randomness flows
through an explicit ``numpy.random.Generator`` so epochs are reproducible.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pointnet_autoencoder_tpu.data import fastio

_CACHE_SIZE = 18000


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center on the centroid and scale into the unit sphere."""
    pc = pc - pc.mean(axis=0)
    scale = np.max(np.sqrt((pc**2).sum(axis=1)))
    if scale > 0:
        pc = pc / scale
    return pc


def rotate_point_cloud(batch: np.ndarray,
                       rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random per-shape rotation about the up (Y) axis. (B,N,3) -> (B,N,3).

    Matches the augmentation contract of part_dataset.py:21-39: each shape
    gets an independent uniform angle; points are right-multiplied by
    [[c,0,s],[0,1,0],[-s,0,c]].
    """
    rng = rng or np.random.default_rng()
    b = batch.shape[0]
    angles = rng.uniform(0.0, 2.0 * np.pi, size=(b,))
    c, s = np.cos(angles), np.sin(angles)
    zeros = np.zeros_like(c)
    ones = np.ones_like(c)
    # (B,3,3) stack of rotation matrices; one batched matmul, no python loop.
    rot = np.stack(
        [c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1
    ).reshape(b, 3, 3)
    return np.einsum("bnc,bcd->bnd", batch, rot).astype(np.float32)


class PartDataset:
    """Indexable ShapeNetPart dataset.

    Args mirror the reference constructor (part_dataset.py:42): ``root``,
    ``npoints``, ``classification``, ``class_choice`` (an iterable of
    category names or None for all), ``split`` in
    {train, val, trainval, test}, ``normalize``.

    ``dataset[i]`` returns (points (npoints,3) f32, seg (npoints,) i64) or,
    in classification mode, (points, cls (1,) i32).
    """

    def __init__(self, root: str, npoints: int = 2500,
                 classification: bool = False,
                 class_choice: Optional[Sequence[str]] = None,
                 split: str = "train", normalize: bool = True,
                 seed: Optional[int] = None,
                 cache_dir: Optional[str] = None):
        self.root = root
        self.npoints = npoints
        self.classification = classification
        self.normalize = normalize
        self._rng = np.random.default_rng(seed)
        # Optional on-disk cache of decoded shapes ([new], no reference
        # analog -- the reference re-runs np.loadtxt every process start,
        # part_dataset.py:110-113). Stores raw (un-normalized) points +
        # 1-based labels as .npz, so one cache serves any normalize/npoints
        # setting; entries are invalidated by source-file mtime.
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

        catfile = os.path.join(root, "synsetoffset2category.txt")
        if not os.path.exists(catfile):
            raise FileNotFoundError(
                f"no ShapeNetPart dataset at {root!r} (missing "
                f"synsetoffset2category.txt). Point --data_path at a "
                f"shapenetcore_partanno_segmentation_benchmark_v0 directory, "
                f"or generate a synthetic fixture: python -c \"from "
                f"pointnet_autoencoder_tpu.data import synthetic; "
                f"synthetic.write_fixture('{root}', 60, 512)\""
            )
        self.cat: Dict[str, str] = {}
        with open(catfile) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) == 2:
                    self.cat[parts[0]] = parts[1]
        if class_choice is not None:
            chosen = set(class_choice)
            self.cat = {k: v for k, v in self.cat.items() if k in chosen}
            if not self.cat:
                raise ValueError(f"no categories match {class_choice!r}")

        split_ids = self._load_split_ids(split)

        # datapath: (category, pts_path, seg_path) triples.
        self.datapath: List[Tuple[str, str, str]] = []
        for item, synset in self.cat.items():
            dir_point = os.path.join(root, synset, "points")
            dir_seg = os.path.join(root, synset, "points_label")
            for fn in sorted(os.listdir(dir_point)):
                token = os.path.splitext(fn)[0]
                if split_ids is not None and token not in split_ids:
                    continue
                self.datapath.append((
                    item,
                    os.path.join(dir_point, token + ".pts"),
                    os.path.join(dir_seg, token + ".seg"),
                ))

        self.classes = {cat: i for i, cat in enumerate(self.cat)}
        self.num_seg_classes = self._scan_seg_classes()
        self._cache: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def drop_item_cache(self) -> None:
        """Release the in-RAM item cache (hundreds of MB at real-archive
        scale). Safe any time: items re-decode (and re-cache) lazily on
        the next access. Device-input mode calls this after uploading the
        whole dataset to HBM (data/device_pipeline.py)."""
        self._cache.clear()

    def _load_split_ids(self, split: str):
        def ids(name):
            path = os.path.join(self.root, "train_test_split",
                                f"shuffled_{name}_file_list.json")
            with open(path) as f:
                return {entry.split("/")[2] for entry in json.load(f)}

        if split == "trainval":
            return ids("train") | ids("val")
        if split in ("train", "val", "test"):
            return ids(split)
        raise ValueError(f"unknown split {split!r}")

    def _scan_seg_classes(self) -> int:
        """Max part-label count over a 2% sample, as the reference does
        (part_dataset.py:94-98)."""
        if self.classification or not self.datapath:
            return 0
        n = 0
        for i in range(0, max(1, len(self.datapath) // 50)):
            seg = fastio.load_seg(self.datapath[i][2])
            n = max(n, len(np.unique(seg)))
        return n

    def _disk_cache_path(self, pts_path: str) -> Optional[str]:
        if not self.cache_dir:
            return None
        synset = os.path.basename(os.path.dirname(os.path.dirname(pts_path)))
        token = os.path.splitext(os.path.basename(pts_path))[0]
        # Key on the absolute source path too: two dataset roots sharing a
        # cache_dir reuse synset/token names, and an mtime-only check
        # would silently serve one dataset's points for the other's.
        root_tag = hashlib.sha1(
            os.path.abspath(pts_path).encode()).hexdigest()[:8]
        return os.path.join(self.cache_dir,
                            f"{synset}_{token}_{root_tag}.npz")

    def _decode(self, pts_path: str, seg_path: str):
        """Raw (points f32, 1-based seg i64), via the on-disk cache when
        enabled. Cache writes are atomic (tmp + rename) so concurrent
        processes sharing a cache_dir never see torn files."""
        cpath = self._disk_cache_path(pts_path)
        if cpath is not None:
            try:
                src_mtime = max(os.path.getmtime(pts_path),
                                os.path.getmtime(seg_path))
                if os.path.getmtime(cpath) >= src_mtime:
                    with np.load(cpath) as z:
                        return z["pts"], z["seg"]
            except (OSError, KeyError, ValueError):
                pass  # missing/stale/corrupt entry: fall through and rewrite
        point_set = fastio.load_pts(pts_path).astype(np.float32)
        seg = fastio.load_seg(seg_path).astype(np.int64)
        if cpath is not None:
            tmp = f"{cpath}.tmp-{os.getpid()}.npz"
            try:
                np.savez(tmp, pts=point_set, seg=seg)
                os.replace(tmp, cpath)
            except OSError:
                pass  # cache dir read-only/full: caching is best-effort
        return point_set, seg

    def _load(self, index: int):
        if index in self._cache:
            return self._cache[index]
        cat, pts_path, seg_path = self.datapath[index]
        cls = np.array([self.classes[cat]], dtype=np.int32)
        point_set, seg = self._decode(pts_path, seg_path)
        if self.normalize:
            point_set = pc_normalize(point_set)
        seg = seg - 1  # labels on disk are 1-based
        item = (point_set.astype(np.float32), seg, cls)
        if len(self._cache) < _CACHE_SIZE:
            self._cache[index] = item
        return item

    def __getitem__(self, index: int):
        point_set, seg, cls = self._load(index)
        # Resample with replacement -- fresh randomness on every access.
        choice = self._rng.integers(0, len(seg), size=self.npoints)
        point_set = point_set[choice, :]
        if self.classification:
            return point_set, cls
        return point_set, seg[choice]

    def __len__(self) -> int:
        return len(self.datapath)
