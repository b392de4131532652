"""Whole-encoder eval fusion (ops/fused_encoder.py): kernel parity vs the
composed eval math, module parity vs the layer-by-layer path, variable-tree
compatibility, and sharded-jit composition.

Reference behavior being matched: eval-mode conv1..conv5 + max-pool
(models/model.py:43-64) with BN on moving statistics
(utils/tf_util.py:514-533, is_training=False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_autoencoder_tpu.nn.encoder import PointNetEncoder
from pointnet_autoencoder_tpu.ops import fused_encoder

EPS = 1e-3


def _layer(rng, c, f):
    w = (rng.randn(c, f) * 0.3).astype(np.float32)
    b = (rng.randn(f) * 0.1).astype(np.float32)
    gamma = (1.0 + 0.2 * rng.randn(f)).astype(np.float32)
    beta = (0.1 * rng.randn(f)).astype(np.float32)
    mean = (0.05 * rng.randn(f)).astype(np.float32)
    var = (1.0 + 0.1 * rng.rand(f)).astype(np.float32)
    return tuple(map(jnp.asarray, (w, b, gamma, beta, mean, var)))


def _chain(widths, c0=3, seed=0):
    rng = np.random.RandomState(seed)
    layers, c = [], c0
    for f in widths:
        layers.append(_layer(rng, c, f))
        c = f
    return layers


def _composed_eval(points, layers, dtype=jnp.float32):
    """Layer-by-layer eval math in the same precision class (f32 affine,
    activations materialized in the matmul dtype between layers)."""
    x = points.astype(dtype)
    for (w, b, gamma, beta, mean, var) in layers:
        y = jnp.dot(x, w.astype(dtype), preferred_element_type=jnp.float32)
        inv = jax.lax.rsqrt(var + EPS)
        o = jnp.maximum(y * (gamma * inv) + (b - mean) * (gamma * inv) + beta,
                        0.0)
        x = o.astype(dtype)
    return jnp.max(o, axis=1)


@pytest.mark.parametrize("widths", [(64, 64, 64, 128, 1024), (32, 128)])
def test_kernel_matches_composed_f32(widths):
    layers = _chain(widths, seed=1)
    pts = jnp.asarray(np.random.RandomState(2).randn(2, 64, 3), jnp.float32)
    out = jax.jit(
        lambda p: fused_encoder.fused_encoder_eval(p, layers, eps=EPS)
    )(pts)
    ref = _composed_eval(pts, layers)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_kernel_matches_composed_bf16():
    layers = _chain((64, 64, 64, 128, 1024), seed=3)
    pts = jnp.asarray(np.random.RandomState(4).randn(2, 64, 3), jnp.float32)
    out = fused_encoder.fused_encoder_eval(
        pts, layers, eps=EPS, dtype=jnp.bfloat16)
    ref = _composed_eval(pts, layers, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_supports_pallas_gating():
    assert fused_encoder.supports_pallas(2048, (64, 64, 64, 128, 1024))
    assert not fused_encoder.supports_pallas(7, (64,))  # no 8-multiple tile
    assert not fused_encoder.supports_pallas(64, (8192,))  # too wide


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_encoder_module_fused_matches_unfused(dtype):
    """train=False with the Pallas impl (whole-chain kernel) vs the
    layer-by-layer XLA path, same variables."""
    pts = jnp.asarray(np.random.RandomState(5).randn(2, 64, 3), jnp.float32)
    variables = PointNetEncoder(dtype=dtype).init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    # Make moving stats non-trivial so the BN affine actually does work.
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, variables)
    out_fused = PointNetEncoder(dtype=dtype, head_impl="pallas").apply(
        variables, pts, train=False, bn_momentum=0.9)
    out_plain = PointNetEncoder(dtype=dtype, head_impl="xla").apply(
        variables, pts, train=False, bn_momentum=0.9)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out_fused, np.float32),
                               np.asarray(out_plain, np.float32),
                               rtol=tol, atol=tol)
    assert out_fused.dtype == dtype


def test_variable_tree_identical_across_impls():
    """Both branches declare the exact same variables, so checkpoints are
    interchangeable and init may run under either impl."""
    pts = jnp.zeros((2, 64, 3), jnp.float32)
    v_fused = PointNetEncoder(head_impl="pallas").init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    v_plain = PointNetEncoder(head_impl="xla").init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        v_fused, v_plain)


def test_train_apply_after_fused_eval_init():
    """A variables tree initialized via the fused-eval branch trains through
    the layer-by-layer branch (the paths share one tree)."""
    pts = jnp.asarray(np.random.RandomState(6).randn(2, 64, 3), jnp.float32)
    variables = PointNetEncoder(head_impl="pallas").init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    out, mutated = PointNetEncoder(head_impl="pallas").apply(
        variables, pts, train=True, bn_momentum=0.5,
        mutable=["batch_stats"])
    assert out.shape == (2, 1024)
    assert "conv1" in mutated["batch_stats"]


def test_odd_point_count_falls_back():
    """N with no 8-multiple tile divisor routes to the layer path even under
    the Pallas impl (same answer, no kernel)."""
    pts = jnp.asarray(np.random.RandomState(7).randn(2, 50, 3), jnp.float32)
    variables = PointNetEncoder(head_impl="pallas").init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    out_p = PointNetEncoder(head_impl="pallas").apply(
        variables, pts, train=False, bn_momentum=0.9)
    out_x = PointNetEncoder(head_impl="xla").apply(
        variables, pts, train=False, bn_momentum=0.9)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-5)


def test_fused_encoder_under_sharded_jit():
    """The eval kernel composes with a batch-sharded GSPMD jit."""
    from pointnet_autoencoder_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh()
    layers = _chain((64, 128), seed=8)
    pts = jnp.asarray(np.random.RandomState(9).randn(8, 32, 3), jnp.float32)
    ps = jax.device_put(pts, meshlib.batch_sharding(mesh))
    out = jax.jit(
        lambda p: fused_encoder.fused_encoder_eval(p, layers, eps=EPS)
    )(ps)
    ref = fused_encoder.fused_encoder_eval(pts, layers, eps=EPS)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# MomentStatsPointMLP (conv1..conv4 statistics from input moments)
# ---------------------------------------------------------------------------


def _mlp_pair(feats=32, c=8, seed=10):
    from pointnet_autoencoder_tpu.nn.encoder import MomentStatsPointMLP
    from pointnet_autoencoder_tpu.nn.layers import PointMLP

    x = jnp.asarray(np.random.RandomState(seed).randn(4, 24, c), jnp.float32)
    variables = PointMLP(feats).init(
        jax.random.PRNGKey(1), x, train=False, bn_momentum=0.9)
    return MomentStatsPointMLP(feats), PointMLP(feats), variables, x


def test_moment_mlp_tree_matches_pointmlp():
    from pointnet_autoencoder_tpu.nn.encoder import MomentStatsPointMLP
    from pointnet_autoencoder_tpu.nn.layers import PointMLP

    x = jnp.zeros((2, 16, 8), jnp.float32)
    a = MomentStatsPointMLP(32).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    b = PointMLP(32).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    assert (jax.tree_util.tree_map(lambda v: v.shape, a)
            == jax.tree_util.tree_map(lambda v: v.shape, b))


@pytest.mark.parametrize("train", [True, False])
def test_moment_mlp_matches_pointmlp(train):
    mom, plain, variables, x = _mlp_pair()
    out_m, mut_m = mom.apply(variables, x, train=train, bn_momentum=0.5,
                             mutable=["batch_stats"])
    out_p, mut_p = plain.apply(variables, x, train=train, bn_momentum=0.5,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(out_m, out_p, rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        mut_m["batch_stats"], mut_p["batch_stats"])


def test_moment_mlp_grads_match_pointmlp():
    mom, plain, variables, x = _mlp_pair(seed=11)

    def loss(params, mod):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, bn_momentum=0.9, mutable=["batch_stats"])
        return jnp.sum(out**2)

    gm = jax.grad(lambda p: loss(p, mom))(variables["params"])
    gp = jax.grad(lambda p: loss(p, plain))(variables["params"])
    # Stats computed via the moment identity vs directly: values equal up
    # to f32 rounding; bias-type grads through BN are ~0 by cancellation,
    # hence the atol (same rationale as the fused head's grad test).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-3),
        gm, gp)


def test_encoder_moment_stats_matches_direct_train():
    pts = jnp.asarray(np.random.RandomState(12).randn(2, 64, 3), jnp.float32)
    variables = PointNetEncoder(moment_stats=False).init(
        jax.random.PRNGKey(0), pts, train=False, bn_momentum=0.9)
    out_m, mut_m = PointNetEncoder(moment_stats=True).apply(
        variables, pts, train=True, bn_momentum=0.5, mutable=["batch_stats"])
    out_d, mut_d = PointNetEncoder(moment_stats=False).apply(
        variables, pts, train=True, bn_momentum=0.5, mutable=["batch_stats"])
    np.testing.assert_allclose(out_m, out_d, rtol=2e-3, atol=2e-3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4),
        mut_m["batch_stats"], mut_d["batch_stats"])
