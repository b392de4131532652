"""Chamfer (nn_distance) op tests: oracle parity, gradients, both impls.

Mirrors the reference's embedded checks: tf_nndistance_cpu.py:28-48 (numpy
oracle comparison) and the commented-out finite-difference harness at
tf_nndistance.py:68-85, promoted to real tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_autoencoder_tpu.ops import chamfer
from pointnet_autoencoder_tpu.ops import oracles

IMPLS = ["xla", "pallas"]


def _rand_clouds(b, n, m, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(b, n, 3).astype(np.float32),
        rng.randn(b, m, 3).astype(np.float32),
    )


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("b,n,m", [(2, 5, 6), (1, 37, 129), (3, 128, 64)])
def test_forward_matches_oracle(impl, b, n, m):
    x1, x2 = _rand_clouds(b, n, m)
    d1, i1, d2, i2 = jax.jit(
        lambda a, b_: chamfer.nn_distance(a, b_, impl=impl)
    )(x1, x2)
    rd1, ri1, rd2, ri2 = oracles.nn_distance_np(x1, x2)
    np.testing.assert_allclose(d1, rd1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d2, rd2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), ri1)
    np.testing.assert_array_equal(np.asarray(i2), ri2)
    assert i1.dtype == jnp.int32 and i2.dtype == jnp.int32


@pytest.mark.parametrize("impl", IMPLS)
def test_backward_matches_analytic_oracle(impl):
    x1, x2 = _rand_clouds(2, 17, 23, seed=1)
    rng = np.random.RandomState(2)
    g_d1 = rng.randn(2, 17).astype(np.float32)
    g_d2 = rng.randn(2, 23).astype(np.float32)

    def f(a, b):
        d1, _, d2, _ = chamfer.nn_distance(a, b, impl=impl)
        return jnp.sum(d1 * g_d1) + jnp.sum(d2 * g_d2)

    gx1, gx2 = jax.grad(f, argnums=(0, 1))(x1, x2)
    _, ri1, _, ri2 = oracles.nn_distance_np(x1, x2)
    rg1, rg2 = oracles.nn_distance_grad_np(x1, x2, ri1, ri2, g_d1, g_d2)
    np.testing.assert_allclose(gx1, rg1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gx2, rg2, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_gradient_finite_difference(impl):
    # Small clouds, well-separated so the argmin is locally stable.
    rng = np.random.RandomState(3)
    x1 = (rng.randn(1, 6, 3) * 2).astype(np.float32)
    x2 = (rng.randn(1, 7, 3) * 2 + 5).astype(np.float32)

    def loss(a):
        d1, _, d2, _ = chamfer.nn_distance(a, jnp.asarray(x2), impl=impl)
        return jnp.mean(d1) + jnp.mean(d2)

    g = np.asarray(jax.grad(loss)(jnp.asarray(x1)))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 3, 1), (0, 5, 2)]:
        xp = x1.copy()
        xp[idx] += eps
        xm = x1.copy()
        xm[idx] -= eps
        fd = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (
            2 * eps
        )
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


def test_impls_agree_on_large_cloud():
    x1, x2 = _rand_clouds(2, 600, 513, seed=4)  # exercises padding remainders
    d1a, i1a, d2a, i2a = chamfer.nn_distance(x1, x2, impl="xla")
    d1b, i1b, d2b, i2b = chamfer.nn_distance(x1, x2, impl="pallas")
    np.testing.assert_allclose(d1a, d1b, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(d2a, d2b, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(i1a), np.asarray(i1b))
    np.testing.assert_array_equal(np.asarray(i2a), np.asarray(i2b))


def test_backward_impls_agree_on_large_padded_cloud():
    """Pallas backward kernel (one-hot matmul segment-sum) vs the XLA
    scatter path at a size that exercises tile padding in both clouds."""
    x1, x2 = _rand_clouds(2, 600, 513, seed=7)
    rng = np.random.RandomState(8)
    g_d1 = rng.randn(2, 600).astype(np.float32)
    g_d2 = rng.randn(2, 513).astype(np.float32)

    def f(impl):
        def loss(a, b):
            d1, _, d2, _ = chamfer.nn_distance(a, b, impl=impl)
            return jnp.sum(d1 * g_d1) + jnp.sum(d2 * g_d2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))(x1, x2)

    (p1, p2), (r1, r2) = f("pallas"), f("xla")
    np.testing.assert_allclose(p1, r1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(p2, r2, rtol=1e-4, atol=1e-5)


def test_nn_distance_composes_with_vmap():
    """Extra batch axis via vmap, both impls (pallas in interpret mode)."""
    x1, x2 = _rand_clouds(2, 24, 24, seed=9)
    stacked1 = jnp.stack([jnp.asarray(x1)] * 2)
    stacked2 = jnp.stack([jnp.asarray(x2)] * 2)
    for impl in IMPLS:
        d1, i1, d2, i2 = jax.vmap(
            lambda a, b, impl=impl: chamfer.nn_distance(a, b, impl=impl)
        )(stacked1, stacked2)
        assert d1.shape == (2, 2, 24)
        np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d1[1]))


def test_chamfer_loss_value():
    x1, x2 = _rand_clouds(2, 64, 64, seed=5)
    loss = chamfer.chamfer_loss(jnp.asarray(x1), jnp.asarray(x2), impl="xla")
    rd1, _, rd2, _ = oracles.nn_distance_np(x1, x2)
    np.testing.assert_allclose(float(loss), (rd1 + rd2).mean(), rtol=1e-5)


def test_identical_clouds_zero_distance():
    x1, _ = _rand_clouds(1, 50, 50, seed=6)
    d1, i1, d2, i2 = chamfer.nn_distance(x1, x1, impl="xla")
    np.testing.assert_allclose(d1, 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.arange(50)[None])


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fscore_matches_oracle(impl):
    """Random-cloud parity vs the numpy oracle (repo convention: every
    ops/ entry point has an oracles.py counterpart). No fd-gradient test:
    F-score is a piecewise-constant eval metric, not a training loss.
    Thresholds chosen near the clouds' distance scale so precision/recall
    are strictly between 0 and 1."""
    x, y = _rand_clouds(3, 96, 64, seed=8)
    for tau in (0.2, 0.5, 1.0):
        got = np.asarray(chamfer.fscore(jnp.asarray(x), jnp.asarray(y), tau,
                                        impl=impl))
        want = oracles.fscore_np(x, y, tau)
        np.testing.assert_allclose(got, want, rtol=1e-6)
    mid = np.asarray(chamfer.fscore(jnp.asarray(x), jnp.asarray(y), 0.5,
                                    impl=impl))
    assert (mid > 0.0).all() and (mid < 1.0).all()


def test_fscore_semantics():
    """F-score@tau: 1 for identical clouds, 0 for far clouds, and the
    exact precision/recall harmonic mean on a constructed half-overlap
    (squared-distance threshold semantics included)."""
    x, _ = _rand_clouds(1, 32, 32, seed=7)
    np.testing.assert_allclose(
        np.asarray(chamfer.fscore(x, x, 0.01, impl="xla")), 1.0)
    far = x + 100.0
    np.testing.assert_allclose(
        np.asarray(chamfer.fscore(x, far, 0.01, impl="xla")), 0.0)
    # pred = target with half the points displaced by 2*tau: precision =
    # recall = 0.5 -> F = 0.5. Displaced points must not pair with other
    # target points: spread the cloud on a coarse grid.
    tau = 0.01
    tgt = np.zeros((1, 8, 3), np.float32)
    tgt[0, :, 0] = np.arange(8, dtype=np.float32)  # 1.0 apart on x
    pred = tgt.copy()
    pred[0, :4, 1] += 2 * tau
    f = np.asarray(chamfer.fscore(jnp.asarray(pred), jnp.asarray(tgt), tau,
                                  impl="xla"))
    np.testing.assert_allclose(f, 0.5)
    # Threshold compares true (unsquared) distance: displacement tau/2
    # counts, 2*tau does not.
    pred2 = tgt.copy()
    pred2[0, :, 1] += tau / 2
    np.testing.assert_allclose(
        np.asarray(chamfer.fscore(jnp.asarray(pred2), jnp.asarray(tgt), tau,
                                  impl="xla")), 1.0)
