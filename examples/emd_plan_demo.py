"""EMD transport-plan demo: optimize a cloud onto a curve, render the plan.

Headless port of the reference op's embedded demo
(tf_ops/approxmatch/tf_approxmatch.py:53-105): a learnable point cloud is
gradient-descended under the approx-EMD loss toward a parabola-shaped
target (4x as many target points, so each learnable point should absorb ~4
units of mass), then the explicit transport plan from ``approx_match`` is
visualized -- match edges in green, target points red, learned points blue.
The reference shows this live in an OpenCV window; TPU hosts are headless,
so the frame is written to a PNG (same drawing, numpy rasterizer).

Run: python examples/emd_plan_demo.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_autoencoder_tpu.ops import emd
from pointnet_autoencoder_tpu.viz.render import save_image


def make_target(rng: np.random.Generator, n: int) -> np.ndarray:
    """The reference demo's target: a parabola arc with random height."""
    x = np.linspace(-1, 1, n)
    y = float(rng.random()) * 2.0 * np.linspace(1, 0, n) ** 2
    return np.stack([x, y, np.zeros(n)], axis=1).astype(np.float32)[None]


def optimize(target: np.ndarray, npoint: int, steps: int = 3000,
             lr: float = 1e-3, seed: int = 0) -> np.ndarray:
    """Plain gradient descent of sum-EMD(target -> points), the demo's
    objective (tf_approxmatch.py:66-73)."""
    points = jnp.asarray(
        np.random.default_rng(seed).standard_normal((1, npoint, 3)),
        jnp.float32,
    )
    tgt = jnp.asarray(target)

    # tgt is a jit ARGUMENT, not a closure constant: on the axon backend a
    # closed-over-constant gather/scatter graph produces deterministically
    # wrong results (see CLAUDE.md environment gotchas).
    @jax.jit
    def step(pts, tgt):
        def loss_fn(p):
            return jnp.sum(emd.emd_cost(tgt, p))

        loss, g = jax.value_and_grad(loss_fn)(pts)
        return pts - lr * g, loss

    for _ in range(steps):
        points, loss = step(points, tgt)
    print(f"final EMD loss: {float(loss):.4f}")
    return np.asarray(points)


def _draw_line(img, p0, p1, color):
    """Integer-pixel line via dense parameter sampling (no cv2 needed)."""
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
    t = np.linspace(0.0, 1.0, 2 * n + 1)
    xs = np.clip(np.round(p0[0] + t * (p1[0] - p0[0])).astype(int),
                 0, img.shape[1] - 1)
    ys = np.clip(np.round(p0[1] + t * (p1[1] - p0[1])).astype(int),
                 0, img.shape[0] - 1)
    img[ys, xs] = color


def _draw_disc(img, center, r, color):
    x, y = int(round(center[0])), int(round(center[1]))
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dx * dx + dy * dy <= r * r:
                yy, xx = y + dy, x + dx
                if 0 <= yy < img.shape[0] and 0 <= xx < img.shape[1]:
                    img[yy, xx] = color


def render_plan(target: np.ndarray, points: np.ndarray, match: np.ndarray,
                size: int = 400, seed: int = 0) -> np.ndarray:
    """One sampled match edge per target point (the reference samples u ~
    match[l, :] per target l, tf_approxmatch.py:89-95), on white."""
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 255, np.uint8)

    def to_px(p):  # reference mapping: (y*100+200, x*100+200) at size 400
        s = size / 400.0
        return (p[1] * 100.0 * s + size / 2.0, p[0] * 100.0 * s + size / 2.0)

    # match rows index the second cloud (points); columns index target.
    plan = np.asarray(match[0]).T  # (n_target, n_points)
    for l in range(target.shape[1]):
        # float64: f32 probabilities can miss rng.choice's sum-to-1
        # tolerance after division.
        row = np.asarray(plan[l], np.float64)
        tot = row.sum()
        if tot <= 0:
            continue
        u = rng.choice(len(row), p=row / tot)
        _draw_line(img, to_px(target[0, l]), to_px(points[0, u]), (0, 255, 0))
    for p in target[0]:
        _draw_disc(img, to_px(p), 2, (255, 0, 0))
    for p in points[0]:
        _draw_disc(img, to_px(p), 3, (0, 0, 255))
    return img


def main(out_path: str = "emd_plan.png", npoint: int = 100,
         steps: int = 3000) -> str:
    rng = np.random.default_rng(100)
    target = make_target(rng, 4 * npoint)
    points = optimize(target, npoint, steps=steps)
    match = emd.approx_match(jnp.asarray(target), jnp.asarray(points))
    img = render_plan(target, points, np.asarray(match))
    save_image(img, out_path)
    print(f"plan visualization written to {out_path}")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "emd_plan.png")
