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


@pytest.mark.parametrize("b,n,m", [(2, 48, 32), (1, 13, 40), (1, 40, 13)])
def test_chunked_streaming_matches_dense(b, n, m):
    """The non-materializing row-chunked path (ops/emd.py:
    _emd_forward_chunked) must reproduce the dense scan: cost, both
    plan-constant gradients, oracle parity. N=13 is prime (the row axis
    pads to the 8-multiple chunk with zero-capacity rows)."""
    x1, x2 = _rand_clouds(b, n, m, seed=11)
    cd, g1d, g2d = emd._emd_forward(jnp.asarray(x1), jnp.asarray(x2))
    cc, g1c, g2c = jax.jit(emd._emd_forward_chunked)(
        jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(cc), np.asarray(cd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g1d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2c), np.asarray(g2d),
                               rtol=1e-4, atol=1e-6)
    ref = oracles.match_cost_np(x1, x2, oracles.approx_match_np(x1, x2))
    np.testing.assert_allclose(np.asarray(cc), ref, rtol=1e-3, atol=1e-4)


def test_chunked_impl_via_public_api():
    """impl='chunked' routes emd_cost/grads through the streaming path."""
    x1, x2 = _rand_clouds(2, 32, 24, seed=12)

    def loss(a, b, impl):
        return jnp.mean(emd.emd_cost(a, b, impl=impl))

    for impl in ("chunked",):
        got = jax.jit(lambda a, b: loss(a, b, impl))(x1, x2)
        want = loss(jnp.asarray(x1), jnp.asarray(x2), "xla")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        g = jax.grad(lambda a, b: loss(a, b, impl), argnums=(0, 1))(
            jnp.asarray(x1), jnp.asarray(x2))
        gw = jax.grad(lambda a, b: loss(a, b, "xla"), argnums=(0, 1))(
            jnp.asarray(x1), jnp.asarray(x2))
        for a, b in zip(g, gw):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_dense_auto_streams_past_materialization_limit(monkeypatch):
    """impl='xla' must route to the streaming path (NOT materialize
    (B,N,M)) once past _DENSE_BYTES_LIMIT -- the round-3 verdict's OOM
    cliff, pinned by shrinking the limit below a small shape."""
    calls = []
    orig = emd._emd_forward_chunked

    def spy(x1, x2):
        calls.append(x1.shape)
        return orig(x1, x2)

    monkeypatch.setattr(emd, "_emd_forward_chunked", spy)
    monkeypatch.setattr(emd, "_DENSE_BYTES_LIMIT", 4 * 2 * 16 * 16 - 1)
    x1, x2 = _rand_clouds(2, 16, 16, seed=13)
    cost = emd.emd_cost(jnp.asarray(x1), jnp.asarray(x2), impl="xla")
    assert calls, "streaming path was not taken past the limit"
    ref = oracles.match_cost_np(x1, x2, oracles.approx_match_np(x1, x2))
    np.testing.assert_allclose(np.asarray(cost), ref, rtol=1e-3, atol=1e-4)


def test_pick_row_chunk():
    assert emd._pick_row_chunk(1, 16, 16, budget_bytes=1 << 30) == 16
    assert emd._pick_row_chunk(4, 16384, 16384,
                               budget_bytes=256 << 20) == 1024
    # Tiny budget: chunk floors at the sublane multiple, never below.
    assert emd._pick_row_chunk(1, 13, 1 << 20, budget_bytes=64) == 8


def test_pick_row_chunk_bounds_count_and_bytes():
    """Round-5 contract (verdict #4 + review fix): zero-capacity padding
    means any chunk size works, so the picker takes the LARGEST chunk the
    byte budget admits -- never chunk=1 scan poison for a prime N, a
    chunk count <= 64 for every shape whose budget allows it, and the
    (B, chunk, M) buffer NEVER exceeds the budget beyond the 8-row
    sublane floor (the pre-fix count escalation handed B=32 N=M=32768 a
    2.1 GB buffer, 8x budget -- an OOM risk on the path that exists to be
    OOM-safe)."""
    budget = 256 * 1024 * 1024
    for b, n, m in [(1, 12289, 12289), (2, 12289, 12289), (1, 65521, 512),
                    (4, 9999, 7777), (1, 101, 103), (32, 32768, 32768),
                    (4, 16384, 16384)]:
        chunk = emd._pick_row_chunk(b, n, m)
        nc = -(-n // chunk)
        # Budget always holds (up to the sublane-rounding floor).
        assert 4 * b * chunk * m <= max(budget + 4 * b * 8 * m,
                                        4 * b * 8 * m), (b, n, m, chunk)
        # No scan poison: the chunk floors at the sublane multiple.
        assert chunk >= min(n, 8), (b, n, m, chunk)
        assert chunk % 8 == 0 or chunk == n
        # Whenever the budget admits n/64 rows per chunk, the count bound
        # holds too.
        if budget // (4 * b * m) >= -(-n // 64):
            assert nc <= 64, (b, n, m, chunk, nc)


@pytest.mark.parametrize("b,n,m,chunk", [(2, 40, 32, 16), (1, 13, 40, 8)])
def test_chunked_streaming_multi_chunk_exact(b, n, m, chunk, monkeypatch):
    """Force nc >= 2 (the default 256 MB budget gives every CPU-test shape
    a single chunk): the cross-chunk colsum accumulation in pass A and the
    zero-capacity padding landing in the FINAL chunk of a multi-chunk scan
    must reproduce the dense scan exactly. Without this pin, a regression
    in the chunk-loop accumulation would only surface in the opt-in
    --large_n hardware run (review finding)."""
    monkeypatch.setattr(emd, "_pick_row_chunk", lambda *a, **k: chunk)
    nc = -(-n // chunk)
    assert nc >= 2
    x1, x2 = _rand_clouds(b, n, m, seed=31)
    cd, g1d, g2d = emd._emd_forward(jnp.asarray(x1), jnp.asarray(x2))
    cc, g1c, g2c = jax.jit(emd._emd_forward_chunked)(
        jnp.asarray(x1), jnp.asarray(x2))
    assert g1c.shape == (b, n, 3)
    np.testing.assert_allclose(np.asarray(cc), np.asarray(cd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g1d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2c), np.asarray(g2d),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("b,n,m", [(1, 101, 64), (2, 53, 40)])
def test_chunked_streaming_padded_rows_exact(b, n, m):
    """Prime N that does NOT divide by the chosen chunk: the zero-capacity
    row padding must be numerically invisible -- cost, grads, and oracle
    parity all match the dense scan, and grad1 keeps shape (B, N, 3)."""
    x1, x2 = _rand_clouds(b, n, m, seed=21)
    chunk = emd._pick_row_chunk(b, n, m)
    assert n % chunk != 0  # the shape really exercises padding
    cd, g1d, g2d = emd._emd_forward(jnp.asarray(x1), jnp.asarray(x2))
    cc, g1c, g2c = jax.jit(emd._emd_forward_chunked)(
        jnp.asarray(x1), jnp.asarray(x2))
    assert g1c.shape == (b, n, 3)
    np.testing.assert_allclose(np.asarray(cc), np.asarray(cd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1c), np.asarray(g1d),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2c), np.asarray(g2d),
                               rtol=1e-4, atol=1e-6)
    ref = oracles.match_cost_np(x1, x2, oracles.approx_match_np(x1, x2))
    np.testing.assert_allclose(np.asarray(cc), ref, rtol=1e-3, atol=1e-4)


def test_kernel_envelope_estimate():
    """The VMEM estimate replacing the hard N<=8192 guard: shapes known to
    compile stay in-envelope (cached where round 2/3 validated caching);
    N=M=32768 falls out to the streaming path."""
    from pointnet_autoencoder_tpu.ops import emd_pallas

    est = emd_pallas._vmem_estimate_bytes
    limit = emd_pallas._VMEM_LIMIT
    assert est(2048, 2048, 512, True) <= limit      # flagship, cached
    assert est(4096, 4096, 256, True) <= limit      # round-2 validated
    assert est(16384, 16384, 64, False) <= limit    # new envelope member
    assert est(32768, 32768, 32, False) > limit     # streaming takes over
    # The wrapper agrees: 16384 stays on the kernel path in interpret mode
    # only via its shape gate (don't execute it here -- too slow on CPU);
    # check the gating decision directly.
    tile = emd_pallas._pick_tile_n(16384, 16384)
    assert tile > 0
    assert not (16384 * 16384 * 4 <= emd_pallas._D2_CACHE_BUDGET)


def test_emd_loss_zero_for_identical_clouds():
    x1, _ = _rand_clouds(1, 32, 32, seed=6)
    loss = emd.emd_loss(jnp.asarray(x1), jnp.asarray(x1))
    assert float(loss) < 0.05
