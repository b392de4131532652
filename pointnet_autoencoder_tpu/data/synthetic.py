"""Synthetic on-disk ShapeNetPart fixture.

Writes a tiny dataset in the exact layout PartDataset consumes
(synsetoffset2category.txt, train_test_split/*.json, <synset>/points/*.pts,
<synset>/points_label/*.seg), so the loader, pipeline, CLI, and end-to-end
training can run without the real 635 MB archive. Shapes are simple
parametric surfaces (sphere / box shell / cylinder) with part labels by
region, which gives the autoencoder something learnable.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

_SYNSETS = {"Chair": "03001627", "Table": "04379243", "Lamp": "03636649"}

# All 16 ShapeNetPart categories with their real synset offsets
# (the v0 archive's synsetoffset2category.txt; /root/reference/README.md:18
# names the archive, part_dataset.py:45-54 consumes this map). Used by the
# full-archive-scale fixture; the 3-category trio above stays the default
# so small fixtures stay small.
_SYNSETS_FULL = {
    "Airplane": "02691156", "Bag": "02773838", "Cap": "02954340",
    "Car": "02958343", "Chair": "03001627", "Earphone": "03261776",
    "Guitar": "03467517", "Knife": "03624134", "Lamp": "03636649",
    "Laptop": "03642806", "Motorbike": "03790512", "Mug": "03797390",
    "Pistol": "03948459", "Rocket": "04099429", "Skateboard": "04225987",
    "Table": "04379243",
}

# Published per-category shape totals of the ShapeNetPart segmentation
# benchmark (16,881 shapes; the table from the PointNet/ShapeNetPart
# literature). APPROXIMATE per-category ground truth for the v0 archive --
# used only to size the calibration fixture; cli/parity.py verifies exact
# split counts the day the real archive exists.
REAL_V0_COUNTS = {
    "Airplane": 2690, "Bag": 76, "Cap": 55, "Car": 898, "Chair": 3758,
    "Earphone": 69, "Guitar": 787, "Knife": 392, "Lamp": 1547,
    "Laptop": 451, "Motorbike": 202, "Mug": 184, "Pistol": 283,
    "Rocket": 66, "Skateboard": 152, "Table": 5271,
}


def _make_shape(rng: np.random.Generator, kind: int, npts: int):
    if kind == 0:  # sphere with hemisphere part labels
        v = rng.normal(size=(npts, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
        seg = (v[:, 1] > 0).astype(np.int64) + 1
    elif kind == 1:  # axis-aligned box shell, labels by dominant face axis
        face = rng.integers(0, 3, size=npts)
        signs = rng.choice([-1.0, 1.0], size=npts)
        v = rng.uniform(-1, 1, size=(npts, 3))
        v[np.arange(npts), face] = signs
        seg = face.astype(np.int64) + 1
    else:  # cylinder with cap/side labels
        theta = rng.uniform(0, 2 * np.pi, size=npts)
        y = rng.uniform(-1, 1, size=npts)
        v = np.stack([np.cos(theta), y, np.sin(theta)], axis=1)
        cap = rng.random(npts) < 0.2
        v[cap, 1] = np.sign(v[cap, 1])
        seg = cap.astype(np.int64) + 1
    # Random anisotropic scale + jitter so shapes differ.
    v = v * rng.uniform(0.5, 1.5, size=(1, 3))
    v = v + rng.normal(scale=0.02, size=v.shape)
    return v.astype(np.float32), seg


def write_fixture(root: str, shapes_per_category: int = 12,
                  points_per_shape: int = 128, seed: int = 0,
                  categories: List[str] | None = None,
                  variable_points: bool = False,
                  category_counts: Dict[str, int] | None = None) -> str:
    """Creates the fixture under ``root`` and returns ``root``.

    ``variable_points`` draws each shape's point count uniformly from
    [points_per_shape/2, points_per_shape], like the real archive's ragged
    shapes -- exercising the resample-with-replacement and DeviceDataset
    cyclic-padding paths.

    ``category_counts`` overrides ``shapes_per_category`` per category
    (see ``write_real_scale_fixture``)."""
    rng = np.random.default_rng(seed)
    synsets = dict(_SYNSETS, **_SYNSETS_FULL)
    cats = (categories if categories is not None
            else list(category_counts) if category_counts is not None
            else list(_SYNSETS))
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "synsetoffset2category.txt"), "w") as f:
        for c in cats:
            f.write(f"{c}\t{synsets[c]}\n")

    splits: Dict[str, List[str]] = {"train": [], "val": [], "test": []}
    for c in cats:
        synset = synsets[c]
        count = (category_counts[c] if category_counts is not None
                 else shapes_per_category)
        pts_dir = os.path.join(root, synset, "points")
        seg_dir = os.path.join(root, synset, "points_label")
        os.makedirs(pts_dir, exist_ok=True)
        os.makedirs(seg_dir, exist_ok=True)
        for i in range(count):
            token = f"{synset}_{i:04d}"
            npts = (int(rng.integers(points_per_shape // 2,
                                     points_per_shape + 1))
                    if variable_points else points_per_shape)
            pts, seg = _make_shape(rng, i % 3, npts)
            np.savetxt(os.path.join(pts_dir, token + ".pts"), pts, fmt="%.6f")
            np.savetxt(os.path.join(seg_dir, token + ".seg"), seg, fmt="%d")
            # ~2/3 train, 1/6 val, 1/6 test.
            bucket = ("train", "val", "test")[0 if i % 6 < 4 else 1 if i % 6 == 4 else 2]
            splits[bucket].append(f"shape_data/{synset}/{token}")

    split_dir = os.path.join(root, "train_test_split")
    os.makedirs(split_dir, exist_ok=True)
    for name, entries in splits.items():
        with open(os.path.join(split_dir, f"shuffled_{name}_file_list.json"),
                  "w") as f:
            json.dump(entries, f)
    return root


def write_real_scale_fixture(root: str, points_per_shape: int = 3000,
                             seed: int = 0) -> str:
    """Fixture at the FULL real-archive scale: all 16 ShapeNetPart
    categories with their published per-category shape totals (16,881
    shapes; REAL_V0_COUNTS) and ragged point counts averaging ~2,250
    (``variable_points`` over ``points_per_shape``; the real archive
    averages ~2,600). The split-bucket cycle yields the v0 archive's
    ~5/6 trainval, 1/6 test proportions.

    Purpose: wall-clock and memory calibration of full-dataset training
    runs (the real archive is not downloadable in this environment --
    docs/RESULTS.md); it makes numbers like "the full 16-category schedule
    takes X minutes" measurable today. Statistical content is still
    synthetic -- convergence losses are not comparable to real data."""
    return write_fixture(
        root, points_per_shape=points_per_shape, seed=seed,
        variable_points=True, category_counts=REAL_V0_COUNTS,
    )
