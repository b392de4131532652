"""Approx-EMD op tests: golden oracle parity, gradients, convergence.

The oracle is a numpy port of the reference *GPU* kernel semantics
(tf_approxmatch_g.cu, the variant used in training). The convergence test is
the reference's embedded "optimize points onto a parabola" demo
(tf_approxmatch.py:53-105) promoted to an assertion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointnet_autoencoder_tpu.ops import emd
from pointnet_autoencoder_tpu.ops import oracles


def _rand_clouds(b, n, m, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (
        (rng.rand(b, n, 3) * scale).astype(np.float32),
        (rng.rand(b, m, 3) * scale).astype(np.float32),
    )


@pytest.mark.parametrize("b,n,m", [(1, 8, 8), (2, 33, 33), (1, 64, 16), (1, 16, 64)])
def test_approx_match_matches_oracle(b, n, m):
    x1, x2 = _rand_clouds(b, n, m)
    match = jax.jit(emd.approx_match)(x1, x2)
    ref = oracles.approx_match_np(x1, x2)
    assert match.shape == (b, m, n)
    np.testing.assert_allclose(np.asarray(match), ref, rtol=1e-3, atol=1e-4)


def test_match_is_doubly_stochastic_like():
    # For equal sizes, every point should end up (nearly) fully transported.
    x1, x2 = _rand_clouds(2, 32, 32, seed=1)
    match = np.asarray(emd.approx_match(x1, x2))
    np.testing.assert_allclose(match.sum(axis=1), 1.0, atol=1e-2)
    np.testing.assert_allclose(match.sum(axis=2), 1.0, atol=1e-2)
    assert (match >= 0).all()


def test_match_cost_matches_oracle():
    x1, x2 = _rand_clouds(2, 24, 24, seed=2)
    match = oracles.approx_match_np(x1, x2)
    cost = emd.match_cost(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(match))
    ref = oracles.match_cost_np(x1, x2, match)
    np.testing.assert_allclose(np.asarray(cost), ref, rtol=1e-4, atol=1e-5)


def test_match_cost_grad_matches_oracle():
    x1, x2 = _rand_clouds(1, 12, 12, seed=3)
    match = oracles.approx_match_np(x1, x2)

    def f(a, b):
        return jnp.sum(emd.match_cost(a, b, jnp.asarray(match)))

    g1, g2 = jax.grad(f, argnums=(0, 1))(jnp.asarray(x1), jnp.asarray(x2))
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, match)
    np.testing.assert_allclose(np.asarray(g1), rg1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), rg2, rtol=1e-4, atol=1e-5)


def test_match_cost_grad_finite_difference():
    x1, x2 = _rand_clouds(1, 6, 6, seed=4, scale=2.0)
    match = oracles.approx_match_np(x1, x2)

    def loss(a):
        return jnp.sum(emd.match_cost(a, jnp.asarray(x2), jnp.asarray(match)))

    g = np.asarray(jax.grad(loss)(jnp.asarray(x1)))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 2, 1), (0, 5, 2)]:
        xp = x1.copy(); xp[idx] += eps
        xm = x1.copy(); xm[idx] -= eps
        fd = (float(loss(jnp.asarray(xp))) - float(loss(jnp.asarray(xm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


def test_emd_gradient_descent_converges_to_parabola():
    """Port of the reference demo: free points optimized under EMD should
    land on the target parabola point set."""
    rng = np.random.RandomState(5)
    t = rng.rand(1, 100, 1).astype(np.float32)
    target = np.concatenate([t, t * t, np.zeros_like(t)], axis=-1)
    pts = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))

    opt = optax.adam(1e-2)
    state = opt.init(pts)

    @jax.jit
    def step(p, s):
        def loss_fn(p_):
            return emd.emd_loss(p_, jnp.asarray(target))

        loss, grad = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grad, s)
        return optax.apply_updates(p, updates), s, loss

    loss0 = None
    for i in range(300):
        pts, state, loss = step(pts, state)
        if i == 0:
            loss0 = float(loss)
    assert float(loss) < 0.15 * loss0, (loss0, float(loss))


def test_pallas_falls_back_for_very_wide_m():
    """When even an 8-row (TN, M) tile would blow the VMEM budget, the
    kernel wrapper must return None (dense fallback), not hand Mosaic a
    guaranteed compile failure."""
    from pointnet_autoencoder_tpu.ops import emd_pallas

    assert emd_pallas._pick_tile_n(512, 2_000_000) == 0
    x1 = jnp.zeros((1, 8, 3), jnp.float32)
    x2 = jnp.zeros((1, 2_000_000, 3), jnp.float32)
    assert emd_pallas.emd_forward_pallas(x1, x2) is None


def test_emd_loss_zero_for_identical_clouds():
    x1, _ = _rand_clouds(1, 32, 32, seed=6)
    loss = emd.emd_loss(jnp.asarray(x1), jnp.asarray(x1))
    assert float(loss) < 0.05
