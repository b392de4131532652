"""Layer library tests: BN semantics, upconv geometry, init conventions."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_autoencoder_tpu.nn.layers import (
    FC,
    BatchNorm,
    Conv,
    Dropout,
    PointMLP,
    UpConv,
    avg_pool,
    max_pool,
)


def test_batchnorm_train_normalizes_and_updates_moving_stats():
    bn = BatchNorm()
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 10, 8)) * 3.0 + 2.0
    variables = bn.init(jax.random.PRNGKey(1), x, True, 0.9)
    y, mutated = bn.apply(variables, x, True, 0.5, mutable=["batch_stats"])
    # Output is normalized with batch stats (beta=0, gamma=1 at init).
    np.testing.assert_allclose(np.asarray(y.mean((0, 1))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std((0, 1))), 1.0, atol=2e-2)
    # moving = 0.5*init + 0.5*batch
    bm = np.asarray(x.mean((0, 1)))
    bv = np.asarray(x.var((0, 1)))
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["mean"]), 0.5 * bm, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["var"]), 0.5 * 1.0 + 0.5 * bv,
        rtol=1e-5,
    )


def test_batchnorm_eval_uses_moving_stats():
    bn = BatchNorm()
    x = jnp.ones((4, 8))
    variables = bn.init(jax.random.PRNGKey(0), x, True, 0.9)
    # At init moving mean=0, var=1 -> eval output = x / sqrt(1+eps).
    y = bn.apply(variables, x, False, 0.9)
    np.testing.assert_allclose(
        np.asarray(y), 1.0 / np.sqrt(1.0 + 1e-3), rtol=1e-6
    )


def test_batchnorm_momentum_is_runtime_no_retrace():
    bn = BatchNorm()
    x = jnp.ones((4, 8))
    variables = bn.init(jax.random.PRNGKey(0), x, True, 0.9)
    traces = 0

    @jax.jit
    def step(v, x, mom):
        nonlocal traces
        traces += 1
        return bn.apply(v, x, True, mom, mutable=["batch_stats"])

    step(variables, x, jnp.float32(0.9))
    step(variables, x, jnp.float32(0.5))  # different momentum, same trace
    assert traces == 1


def test_pointmlp_is_per_point():
    m = PointMLP(16, bn=False, activation=None)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    # Permuting points permutes outputs identically (no cross-point mixing).
    perm = jnp.array([4, 2, 0, 1, 3])
    y_perm = m.apply(v, x[:, perm])
    np.testing.assert_allclose(np.asarray(y[:, perm]), np.asarray(y_perm),
                               rtol=1e-6)


def test_upconv_geometry_matches_reference_stages():
    # All stages from model_upconv.py:75-79 and model_fc_upconv.py:79-86.
    cases = [
        ((1, 2), (2, 2), (2, 2), (2, 4)),
        ((2, 4), (3, 3), (1, 1), (4, 6)),
        ((4, 6), (4, 5), (2, 3), (10, 20)),
        ((10, 20), (5, 7), (3, 3), (32, 64)),
        ((1, 1), (2, 2), (1, 1), (2, 2)),
        ((4, 4), (4, 4), (2, 2), (10, 10)),
        ((10, 10), (5, 5), (3, 3), (32, 32)),
    ]
    for (h, w), k, s, (oh, ow) in cases:
        m = UpConv(4, k, s, bn=False, activation=None)
        x = jnp.zeros((1, h, w, 8))
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == (1, oh, ow, 4), (k, s, y.shape)


def test_general_conv_ranks():
    x1 = jnp.zeros((2, 16, 4))        # 1D
    x2 = jnp.zeros((2, 8, 8, 4))      # 2D
    x3 = jnp.zeros((2, 4, 4, 4, 4))   # 3D
    for x, k in ((x1, (3,)), (x2, (3, 3)), (x3, (2, 2, 2))):
        m = Conv(6, k, bn=True)
        y, _ = m.init_with_output(jax.random.PRNGKey(0), x, True, 0.9)
        assert y.shape == x.shape[:-1] + (6,)


def test_pools():
    x = jnp.arange(32.0).reshape(1, 4, 4, 2)
    mx = max_pool(x, (2, 2))
    av = avg_pool(x, (2, 2))
    assert mx.shape == av.shape == (1, 2, 2, 2)
    assert float(mx[0, 0, 0, 0]) == 10.0   # max of {0,2,8,10}
    assert float(av[0, 0, 0, 0]) == 5.0    # mean of {0,2,8,10}


def test_dropout_train_vs_eval():
    m = Dropout(keep_prob=0.5)
    x = jnp.ones((64, 64))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, True)
    y_eval = m.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
    y_train = m.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
    zeros = float((np.asarray(y_train) == 0).mean())
    assert 0.3 < zeros < 0.7  # ~half dropped
    kept = np.asarray(y_train)[np.asarray(y_train) != 0]
    np.testing.assert_allclose(kept, 2.0, rtol=1e-6)  # inverted scaling


def test_fc_bias_zero_init():
    m = FC(7, bn=False, activation=None)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)))
    np.testing.assert_array_equal(
        np.asarray(v["params"]["dense"]["bias"]), 0.0
    )
    y = m.apply(v, jnp.zeros((2, 3)))
    np.testing.assert_array_equal(np.asarray(y), 0.0)
