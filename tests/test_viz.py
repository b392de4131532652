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


@pytest.mark.skipif(not render.native_available(),
                    reason="native renderer not built")
def test_native_renderer_hostile_coordinates():
    """NaN / wildly off-screen centers must be skipped, not splatted via
    overflowing int arithmetic (the guard in render_balls.cpp)."""
    import ctypes

    lib = render._find_lib()
    size = 64
    img = np.zeros((size, size, 3), np.uint8)
    proj = np.array(
        [[np.nan, 10.0, 1.0],
         [10.0, np.nan, 1.0],
         [1e12, 10.0, 1.0],
         [10.0, -1e12, 1.0],
         [3e9, 3e9, 1.0]],  # > INT_MAX after lround
        np.float32,
    )
    rgb = np.full((len(proj), 3), 255.0, np.float32)
    lib.render_spheres(
        size, size, img.ctypes.data_as(ctypes.c_void_p), len(proj),
        np.ascontiguousarray(proj).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(rgb).ctypes.data_as(ctypes.c_void_p), 4,
    )
    assert img.sum() == 0  # nothing rendered, nothing corrupted


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


def test_magnify_blue_dilates_blue_channel():
    """magnifyBlue parity (show3d_balls.py:88-93): 1px max-dilation of the
    blue channel, level 1 = down+right, level 2 = all four directions."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[4, 4] = (10, 20, 30)
    out1 = render.magnify_blue(img.copy(), 1)
    # Red/green untouched.
    assert out1[:, :, 0].sum() == 10 and out1[:, :, 1].sum() == 20
    blue1 = {tuple(p) for p in np.argwhere(out1[:, :, 2] == 30)}
    assert blue1 == {(4, 4), (5, 4), (4, 5), (5, 5)}
    out2 = render.magnify_blue(img.copy(), 2)
    blue2 = {tuple(p) for p in np.argwhere(out2[:, :, 2] == 30)}
    assert (3, 4) in blue2 and (4, 3) in blue2 and len(blue2) == 9
    # Level 0 is a no-op.
    np.testing.assert_array_equal(render.magnify_blue(img.copy(), 0), img)


def test_freeze_keeps_last_drag_frame():
    """Reference 'f' semantics (show3d_balls.py:53-66,155-156): the freeze
    toggle does not re-render, so the displayed frame keeps the last drag
    angles; the next event's re-render then uses angle 0 while frozen."""
    s = render.ViewerSession(_cloud(50), size=64, ballradius=2)
    s.render_if_needed()
    s.on_mouse(48, 48)  # drag away from center
    s.render_if_needed()
    dragged = s.rendered_angles
    assert dragged != (0.0, 0.0)
    frame = s.img

    s.handle_key(ord("f"))
    assert s.frozen and not s.changed  # no re-render queued by the toggle
    s.render_if_needed()
    assert s.rendered_angles == dragged  # frame persists at drag angles
    assert s.img is frame

    s.on_mouse(10, 10)  # next event re-renders; frozen -> angle 0
    s.render_if_needed()
    assert s.rendered_angles == (0.0, 0.0)

    s.handle_key(ord("f"))  # unfreeze: same no-re-render contract
    assert not s.frozen and not s.changed


def test_viewer_session_hotkeys():
    """Zoom/color/reset hotkeys mutate state and queue a re-render."""
    c_gt = np.zeros((50, 3), np.float32)
    c_pred = np.ones((50, 3), np.float32)
    s = render.ViewerSession(_cloud(50), c_gt=c_gt, c_pred=c_pred,
                             size=64, ballradius=2)
    s.render_if_needed()
    s.handle_key(ord("n"))
    assert s.zoom == pytest.approx(1.1) and s.changed
    s.render_if_needed()
    s.handle_key(ord("m"))
    s.handle_key(ord("r"))
    assert s.zoom == 1.0
    s.handle_key(ord("p"))
    assert s.colors is c_pred
    s.handle_key(ord("t"))
    assert s.colors is c_gt
    assert s.handle_key(ord("q")) == "quit"
    assert s.handle_key(ord("Q")) == "exit"


def test_emd_plan_demo_runs(tmp_path):
    """Tiny end-to-end run of the EMD plan demo (the reference op's embedded
    visualization, tf_approxmatch.py:53-105): optimization reduces the loss
    and the plan render contains all three element colors."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import emd_plan_demo

    out = str(tmp_path / "plan.png")
    path = emd_plan_demo.main(out, npoint=16, steps=30)
    assert os.path.exists(path)
    from PIL import Image
    img = np.asarray(Image.open(path))
    present = {tuple(c) for c in img.reshape(-1, 3)}
    assert (0, 255, 0) in present    # match edges
    assert (255, 0, 0) in present    # target points
    assert (0, 0, 255) in present    # learned points
