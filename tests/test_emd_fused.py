"""Fused (plan-free) EMD path: equality with the plan-based contract."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_autoencoder_tpu.ops import emd, oracles


def _clouds(b, n, m, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (
        (rng.rand(b, n, 3) * scale).astype(np.float32),
        (rng.rand(b, m, 3) * scale).astype(np.float32),
    )


def test_fused_cost_equals_plan_based():
    for n, m, seed in [(32, 32, 0), (48, 16, 1), (16, 48, 2)]:
        x1, x2 = _clouds(2, n, m, seed)
        fused = emd.emd_cost(jnp.asarray(x1), jnp.asarray(x2))
        match = oracles.approx_match_np(x1, x2)
        ref = oracles.match_cost_np(x1, x2, match)
        np.testing.assert_allclose(np.asarray(fused), ref, rtol=1e-3,
                                   atol=1e-4)


def test_fused_grads_equal_plan_based():
    x1, x2 = _clouds(1, 24, 24, seed=3)

    def fused_loss(a, b):
        return jnp.sum(emd.emd_cost(a, b))

    def plan_loss(a, b):
        match = emd.approx_match(a, b)
        return jnp.sum(emd.match_cost(a, b, match))

    gf = jax.grad(fused_loss, argnums=(0, 1))(jnp.asarray(x1),
                                              jnp.asarray(x2))
    gp = jax.grad(plan_loss, argnums=(0, 1))(jnp.asarray(x1),
                                             jnp.asarray(x2))
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)


def test_emd_loss_uses_fused_and_matches_reference_shape():
    x1, x2 = _clouds(2, 20, 20, seed=4)
    fused = emd.emd_loss(jnp.asarray(x2), jnp.asarray(x1))
    via_match = emd.emd_loss_via_match(jnp.asarray(x2), jnp.asarray(x1))
    np.testing.assert_allclose(float(fused), float(via_match), rtol=1e-3)


def test_pallas_fused_matches_oracle_small():
    """Fused Pallas kernel (interpret mode on CPU) against the numpy oracle
    and the analytic grads, small shapes."""
    x1, x2 = _clouds(2, 16, 16, seed=6)
    from pointnet_autoencoder_tpu.ops.emd_pallas import emd_forward_pallas

    res = emd_forward_pallas(jnp.asarray(x1), jnp.asarray(x2),
                             interpret=True)
    assert res is not None
    cost, g1, g2 = res
    match = oracles.approx_match_np(x1, x2)
    np.testing.assert_allclose(np.asarray(cost),
                               oracles.match_cost_np(x1, x2, match),
                               rtol=1e-3, atol=1e-4)
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, match)
    np.testing.assert_allclose(np.asarray(g1), rg1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), rg2, rtol=1e-3, atol=1e-4)


def test_pallas_fused_unequal_sizes():
    x1, x2 = _clouds(1, 32, 8, seed=7)
    from pointnet_autoencoder_tpu.ops.emd_pallas import emd_forward_pallas

    res = emd_forward_pallas(jnp.asarray(x1), jnp.asarray(x2),
                             interpret=True)
    assert res is not None
    cost, g1, g2 = res
    match = oracles.approx_match_np(x1, x2)
    np.testing.assert_allclose(np.asarray(cost),
                               oracles.match_cost_np(x1, x2, match),
                               rtol=1e-3, atol=1e-4)


def test_fused_cost_upstream_cotangent_scaling():
    x1, x2 = _clouds(1, 10, 10, seed=5)
    weights = jnp.asarray(np.array([2.5], np.float32))

    def f(a):
        return jnp.sum(emd.emd_cost(a, jnp.asarray(x2)) * weights)

    g = jax.grad(f)(jnp.asarray(x1))
    g1 = jax.grad(lambda a: jnp.sum(emd.emd_cost(a, jnp.asarray(x2))))(
        jnp.asarray(x1)
    )
    np.testing.assert_allclose(np.asarray(g), 2.5 * np.asarray(g1),
                               rtol=1e-5)


def test_pallas_fused_uncached_d2_branch_matches(monkeypatch):
    """Clouds past the d2-cache budget take the recompute-per-pass branch;
    both branches must agree exactly (same arithmetic, cached or not)."""
    from pointnet_autoencoder_tpu.ops import emd_pallas

    x1, x2 = _clouds(2, 32, 24, seed=8)
    cached = emd_pallas.emd_forward_pallas(
        jnp.asarray(x1), jnp.asarray(x2), interpret=True)
    monkeypatch.setattr(emd_pallas, "_D2_CACHE_BUDGET", 0)
    uncached = emd_pallas.emd_forward_pallas(
        jnp.asarray(x1), jnp.asarray(x2), interpret=True)
    for a, b in zip(cached, uncached):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
