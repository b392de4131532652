"""Latent-space interpolation: train briefly, then walk the embedding space.

Demonstrates the decoder-only serving surface (InferenceSession.decode):
embed two held-out shapes, linearly interpolate between their latents, and
decode each interpolant back to a point cloud — a capability the reference
stack has no analog for (its test.py only ever runs the full forward,
test.py:59-69). Writes a horizontal strip of renders to
``latent_interp.png``. Run:

    python examples/latent_interp.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pointnet_autoencoder_tpu.config import TrainConfig
from pointnet_autoencoder_tpu.data import synthetic
from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset
from pointnet_autoencoder_tpu.inference import InferenceSession
from pointnet_autoencoder_tpu.train.loop import Trainer
from pointnet_autoencoder_tpu.viz import render

NUM_POINT, STEPS = 256, 6

with tempfile.TemporaryDirectory() as tmp:
    fixture = os.path.join(tmp, "fixture")
    synthetic.write_fixture(fixture, shapes_per_category=48,
                            points_per_shape=400, seed=0)
    log_dir = os.path.join(tmp, "log")

    cfg = TrainConfig(model="model", category="Chair", data_path=fixture,
                      log_dir=log_dir, num_point=NUM_POINT, batch_size=8,
                      max_epoch=12, log_every=100, seed=0)
    trainer = Trainer(cfg)
    best = trainer.train()
    print(f"trained 12 epochs; best eval loss {best:.4f}")

    sess = InferenceSession("model", trainer.ckpt.latest(), NUM_POINT,
                            batch_size=STEPS)
    ds = PartDataset(fixture, npoints=NUM_POINT, split="test",
                     class_choice=["Chair"], seed=1)
    a, b = ds[0][0], ds[1][0]

    # Endpoints' latents, then a straight-line walk between them.
    za, zb = sess.embed(np.stack([a, b]))
    ts = np.linspace(0.0, 1.0, STEPS, dtype=np.float32)
    lats = np.stack([(1.0 - t) * za + t * zb for t in ts])
    clouds = sess.decode(lats)
    assert clouds.shape == (STEPS, NUM_POINT, 3)

    # Sanity: the walk's endpoints are the ordinary reconstructions.
    np.testing.assert_allclose(clouds[0], sess.reconstruct(a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(clouds[-1], sess.reconstruct(b),
                               rtol=1e-5, atol=1e-5)

    size = 200
    strip = np.concatenate(
        [render.render_points(c, size=size, ballradius=4) for c in clouds],
        axis=1
    )
    out = os.path.abspath("latent_interp.png")
    render.save_image(strip, out)
    print(f"{STEPS}-step interpolation strip written to {out}")
