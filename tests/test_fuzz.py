"""Property-based (hypothesis) fuzz tests for the custom ops.

The parametrized oracle tests (test_chamfer.py / test_emd.py) pin a handful
of hand-picked shapes; these sweep randomized shapes — including n != m,
tiny clouds, and quantized coordinates that force exact distance ties — to
pin the behavior contracts of SURVEY.md §2.2 across the shape space:

- Chamfer (tf_ops/nn_distance/tf_nndistance.cpp:21-43): squared L2,
  first-minimum tie-break, int32 idx; analytic VJP per tf_nndistance_g.cu:132-151.
- approx_match (tf_ops/approxmatch/tf_approxmatch_g.cu:1-179): GPU annealing
  semantics incl. integer-division capacity factors for unequal sizes.

Examples are deterministic (derandomize=True) and few: every fresh shape
costs a trace/compile on the single-core CI host.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from pointnet_autoencoder_tpu.ops import chamfer, emd, oracles

FUZZ = settings(max_examples=10, deadline=None, derandomize=True)


def _clouds(b, n, m, seed, quantize=False):
    rng = np.random.RandomState(seed)
    x1 = rng.randn(b, n, 3).astype(np.float32)
    x2 = rng.randn(b, m, 3).astype(np.float32)
    if quantize:
        # Multiples of 0.25: squared distances become exactly representable
        # sums of exact squares, so duplicate points produce *exact* ties —
        # the first-minimum tie-break must match the oracle bit-for-bit.
        x1 = np.round(x1 * 2.0) / 4.0
        x2 = np.round(x2 * 2.0) / 4.0
    return x1, x2


@FUZZ
@given(
    impl=st.sampled_from(["xla", "pallas"]),
    b=st.integers(1, 2),
    n=st.integers(1, 96),
    m=st.integers(1, 96),
    seed=st.integers(0, 2**16),
    quantize=st.booleans(),
)
def test_chamfer_forward_fuzz(impl, b, n, m, seed, quantize):
    x1, x2 = _clouds(b, n, m, seed, quantize)
    d1, i1, d2, i2 = chamfer.nn_distance(x1, x2, impl=impl)
    rd1, ri1, rd2, ri2 = oracles.nn_distance_np(x1, x2)
    np.testing.assert_allclose(np.asarray(d1), rd1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), rd2, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), ri1)
    np.testing.assert_array_equal(np.asarray(i2), ri2)


@FUZZ
@given(
    impl=st.sampled_from(["xla", "pallas"]),
    n=st.integers(1, 48),
    m=st.integers(1, 48),
    seed=st.integers(0, 2**16),
)
def test_chamfer_vjp_fuzz(impl, n, m, seed):
    x1, x2 = _clouds(1, n, m, seed)
    rng = np.random.RandomState(seed + 1)
    ct1 = rng.randn(1, n).astype(np.float32)
    ct2 = rng.randn(1, m).astype(np.float32)

    def head(a, b_):
        d1, _, d2, _ = chamfer.nn_distance(a, b_, impl=impl)
        return jnp.sum(d1 * ct1) + jnp.sum(d2 * ct2)

    g1, g2 = jax.grad(head, argnums=(0, 1))(x1, x2)
    _, ri1, _, ri2 = oracles.nn_distance_np(x1, x2)
    rg1, rg2 = oracles.nn_distance_grad_np(x1, x2, ri1, ri2, ct1, ct2)
    np.testing.assert_allclose(np.asarray(g1), rg1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), rg2, rtol=1e-4, atol=1e-5)


@FUZZ
@given(
    n=st.integers(1, 40),
    m=st.integers(1, 40),
    seed=st.integers(0, 2**16),
)
def test_approx_match_fuzz(n, m, seed):
    x1, x2 = _clouds(1, n, m, seed)
    match = np.asarray(emd.approx_match(x1, x2))
    ref = oracles.approx_match_np(x1, x2)
    # rtol=1e-3 is the documented oracle tolerance for the annealing loop
    # (docs/RESULTS.md "Numerical parity"): 10 levels of f32 exp/sum
    # reordering between lax.scan and numpy.
    np.testing.assert_allclose(match, ref, rtol=1e-3, atol=1e-5)
    # Transported mass is bounded by the initialized capacities.
    assert match.min() >= 0.0
    cap_l = 1 if n >= m else m // n
    assert match.sum(axis=1).max() <= cap_l + 1e-3


@FUZZ
@given(
    n=st.integers(2, 40),
    m=st.integers(2, 40),
    seed=st.integers(0, 2**16),
)
def test_emd_fused_equals_plan_path_fuzz(n, m, seed):
    x1, x2 = _clouds(1, n, m, seed)
    fused = np.asarray(emd.emd_cost(x1, x2, impl="xla"))
    plan = np.asarray(
        emd.match_cost(x1, x2, emd.approx_match(x1, x2))
    )
    np.testing.assert_allclose(fused, plan, rtol=1e-4, atol=1e-5)
