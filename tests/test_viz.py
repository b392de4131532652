"""Renderer tests: projection geometry, native/numpy parity, file output."""

import os

import numpy as np
import pytest

from pointnet_autoencoder_tpu.viz import render


def _cloud(n=200, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 3).astype(np.float32)


def test_projection_centers_and_scales():
    xyz = _cloud() * 5 + 10
    proj = render.project(xyz, size=400)
    # Projected coordinates centered in the image and inside the frame
    # (radius scaled to size/2.2).
    assert 150 < proj[:, 0].mean() < 250
    assert proj[:, 0].min() > 0 and proj[:, 0].max() < 400


def test_render_basic_image():
    img = render.render_points(_cloud(), size=200, ballradius=4)
    assert img.shape == (200, 200, 3) and img.dtype == np.uint8
    assert img.max() > 0  # something was drawn
    # Background stays black outside the cloud footprint (corner pixel).
    assert img[0, 0].tolist() == [0, 0, 0]


def test_colors_and_background():
    colors = np.zeros((200, 3), np.float32)
    colors[:, 0] = 1.0  # pure red
    img = render.render_points(_cloud(), colors=colors, size=128,
                               ballradius=3, background=(0, 0, 50))
    assert img[..., 0].max() > 100       # red channel painted
    assert img[..., 1].max() <= 50       # green only from background
    assert img[0, 0].tolist() == [0, 0, 50]


@pytest.mark.skipif(not render.native_available(),
                    reason="native renderer not built")
def test_native_matches_numpy_fallback():
    xyz = _cloud(100, seed=3)
    img_native = render.render_points(xyz, size=160, ballradius=5)
    lib = render._LIB
    try:
        render._LIB = None
        img_np = render.render_points(xyz, size=160, ballradius=5)
    finally:
        render._LIB = lib
    # Same splat geometry; tiny rounding differences allowed on disc edges.
    diff = np.abs(img_native.astype(int) - img_np.astype(int))
    assert (diff > 2).mean() < 0.01


def test_group_colors_blocks():
    c = render.group_colors(64, 4, np.random.default_rng(0))
    assert c.shape == (64, 3)
    assert np.allclose(c[0], c[15]) and not np.allclose(c[0], c[16])


def test_save_image(tmp_path):
    img = render.render_points(_cloud(), size=64, ballradius=2)
    path = str(tmp_path / "out.png")
    render.save_image(img, path)
    written = [f for f in os.listdir(tmp_path) if f.startswith("out")]
    assert written, "no image file written"
