"""Fused encoder head (Dense+BN+ReLU+max) tests: impl parity, exact
statistics from moments, custom-VJP gradients vs autodiff of the composed
form, finite differences, module/checkpoint compatibility, and sharding.

Reference behavior being matched: conv5 + batch_norm + relu + max-pool
(models/model.py:58-64, utils/tf_util.py:120-187).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_autoencoder_tpu.nn.encoder import (
    FusedPointMLPMax,
    PointNetEncoder,
)
from pointnet_autoencoder_tpu.nn.layers import PointMLP
from pointnet_autoencoder_tpu.ops import fused_head

EPS = 1e-3


def _inputs(b=3, n=48, c=16, f=128, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, n, c).astype(np.float32)
    w = (rng.randn(c, f) * 0.3).astype(np.float32)
    bias = (rng.randn(f) * 0.1).astype(np.float32)
    gamma = (1.0 + 0.2 * rng.randn(f)).astype(np.float32)
    beta = (0.1 * rng.randn(f)).astype(np.float32)
    return x, w, bias, gamma, beta


def _naive(x, w, b, gamma, beta, mean, var, eps=EPS):
    """Plain-jnp composition with the statistics supplied externally --
    the autodiff oracle for the custom VJP (same differentiation boundary)."""
    y = jnp.einsum("bnc,cf->bnf", x, w) + b
    xhat = (y - mean) * jax.lax.rsqrt(var + eps)
    return jnp.max(jax.nn.relu(gamma * xhat + beta), axis=1)


def _batch_stats(x, w, b):
    y = jnp.einsum("bnc,cf->bnf", x, w) + b
    mean = jnp.mean(y, axis=(0, 1))
    var = jnp.mean(jnp.square(y), axis=(0, 1)) - mean**2
    return mean, var


def test_head_stats_matches_direct_moments():
    x, w, b, _, _ = _inputs()
    mean, var = fused_head.head_stats(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b))
    dmean, dvar = _batch_stats(x, w, b)
    np.testing.assert_allclose(mean, dmean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(var, dvar, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,n,c,f", [(3, 48, 16, 128), (2, 64, 8, 256)])
def test_forward_matches_numpy_oracle(b, n, c, f):
    """Both impls against the independent float64 numpy oracle (per the
    ops/ convention: compare to a host oracle, not another device program),
    including the argmax the backward keys on."""
    from pointnet_autoencoder_tpu.ops import oracles

    x, w, bias, gamma, beta = _inputs(b, n, c, f, seed=11)
    mean, var = _batch_stats(x, w, bias)
    ref_max, ref_arg = oracles.fused_head_np(
        x, w, bias, gamma, beta, np.asarray(mean), np.asarray(var), eps=EPS)
    for impl in ("xla", "pallas"):
        out = jax.jit(
            lambda *a: fused_head.fused_dense_bn_relu_max(
                *a, eps=EPS, impl=impl)
        )(x, w, bias, gamma, beta, mean, var)
        np.testing.assert_allclose(out, ref_max, rtol=1e-5, atol=1e-5)
    scale, shift = fused_head._fold_affine(
        jnp.asarray(bias), jnp.asarray(gamma), jnp.asarray(beta),
        mean, var, EPS)
    _, arg = fused_head._forward_pallas(
        jnp.asarray(x), jnp.asarray(w), scale, shift, interpret=True)
    np.testing.assert_array_equal(np.asarray(arg), ref_arg)


@pytest.mark.parametrize("b,n,c,f", [(3, 48, 16, 128), (2, 64, 8, 256),
                                     (1, 8, 3, 128)])
def test_forward_parity_across_impls(b, n, c, f):
    x, w, bias, gamma, beta = _inputs(b, n, c, f)
    mean, var = _batch_stats(x, w, bias)
    args = (x, w, bias, gamma, beta, mean, var)
    out_ref = _naive(*args)
    for impl in ("xla", "pallas"):
        out = jax.jit(
            lambda *a: fused_head.fused_dense_bn_relu_max(
                *a, eps=EPS, impl=impl)
        )(*args)
        np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_grads_match_autodiff_composition(impl):
    x, w, bias, gamma, beta = _inputs()
    mean, var = _batch_stats(x, w, bias)
    r = np.random.RandomState(1).randn(*(x.shape[0], w.shape[1])).astype(
        np.float32)

    def loss_fused(*a):
        return jnp.sum(fused_head.fused_dense_bn_relu_max(
            *a, eps=EPS, impl=impl) * r)

    def loss_naive(*a):
        return jnp.sum(_naive(*a) * r)

    args = tuple(map(jnp.asarray, (x, w, bias, gamma, beta, mean, var)))
    gf = jax.jit(jax.grad(loss_fused, argnums=tuple(range(7))))(*args)
    gn = jax.jit(jax.grad(loss_naive, argnums=tuple(range(7))))(*args)
    for a, b_, name in zip(gf, gn,
                           ["x", "w", "b", "gamma", "beta", "mean", "var"]):
        np.testing.assert_allclose(
            a, b_, rtol=1e-4, atol=1e-5,
            err_msg=f"gradient mismatch for {name} (impl={impl})")


def test_grad_with_f32_bias_and_bf16_weights():
    """b may keep f32 while w is bf16 (the public API allows either); the
    bias cotangent must come back in b's dtype, not w's."""
    x, w, bias, gamma, beta = _inputs()
    xb, wb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)
    b32 = jnp.asarray(bias, jnp.float32)
    mean, var = fused_head.head_stats(xb, wb, b32)

    def loss(xa, wa, ba):
        return jnp.sum(fused_head.fused_dense_bn_relu_max(
            xa, wa, ba, jnp.asarray(gamma), jnp.asarray(beta), mean, var,
            eps=EPS, impl="xla"))

    gx, gw, gb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xb, wb, b32)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert gb.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(gb)))


def test_finite_difference_gradients():
    x, w, bias, gamma, beta = _inputs(b=2, n=16, c=4, f=128, seed=3)
    r = np.random.RandomState(4).randn(2, 128).astype(np.float32)

    def loss(xa, wa):
        mean, var = fused_head.head_stats(xa, wa, bias)
        out = fused_head.fused_dense_bn_relu_max(
            xa, wa, bias, gamma, beta, mean, var, eps=EPS, impl="pallas")
        return jnp.sum(out * r)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    f64 = np.float64
    for argi, (arr, grad) in enumerate(zip((x, w), g)):
        flat = arr.reshape(-1)
        rng = np.random.RandomState(argi)
        for idx in rng.choice(flat.size, size=8, replace=False):
            h = 1e-3
            ap = flat.copy(); ap[idx] += h
            am = flat.copy(); am[idx] -= h
            args_p = [x, w]; args_p[argi] = ap.reshape(arr.shape)
            args_m = [x, w]; args_m[argi] = am.reshape(arr.shape)
            fd = (f64(loss(*map(jnp.asarray, args_p)))
                  - f64(loss(*map(jnp.asarray, args_m)))) / (2 * h)
            np.testing.assert_allclose(
                np.asarray(grad).reshape(-1)[idx], fd, rtol=5e-2, atol=1e-3)


def test_dead_channel_gets_zero_grads():
    x, w, bias, gamma, beta = _inputs()
    beta = beta.copy()
    beta[0] = -1e4  # channel 0 output always < 0 -> relu floor -> max == 0
    mean, var = _batch_stats(x, w, bias)

    out = fused_head.fused_dense_bn_relu_max(
        x, w, bias, gamma, beta, mean, var, eps=EPS, impl="pallas")
    assert float(jnp.max(jnp.abs(out[:, 0]))) == 0.0

    def loss(g_, b_):
        return jnp.sum(fused_head.fused_dense_bn_relu_max(
            x, w, bias, g_, b_, mean, var, eps=EPS, impl="pallas"))

    dgamma, dbeta = jax.grad(loss, argnums=(0, 1))(jnp.asarray(gamma),
                                                   jnp.asarray(beta))
    assert float(jnp.abs(dgamma[0])) == 0.0
    assert float(jnp.abs(dbeta[0])) == 0.0


def test_module_param_tree_matches_pointmlp():
    x = jnp.zeros((2, 16, 8), jnp.float32)
    fused = FusedPointMLPMax(128).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    plain = PointMLP(128).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    fshape = jax.tree_util.tree_map(lambda a: a.shape, fused)
    pshape = jax.tree_util.tree_map(lambda a: a.shape, plain)
    assert fshape == pshape  # same collections, names, and shapes


@pytest.mark.parametrize("train", [True, False])
def test_module_impls_agree(train):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 8),
                    jnp.float32)
    variables = FusedPointMLPMax(128).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    outs = {}
    stats = {}
    for impl in ("xla", "pallas"):
        mod = FusedPointMLPMax(128, impl=impl)
        out, mutated = mod.apply(
            variables, x, train=train, bn_momentum=0.5,
            mutable=["batch_stats"])
        outs[impl] = np.asarray(out)
        stats[impl] = mutated["batch_stats"]
    np.testing.assert_allclose(outs["xla"], outs["pallas"],
                               rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4),
        stats["xla"], stats["pallas"])


def test_module_impls_agree_bf16():
    """The training configuration runs the head in bf16; the two impls must
    agree to bf16 resolution."""
    x = jnp.asarray(np.random.RandomState(7).randn(2, 32, 8), jnp.float32)
    variables = FusedPointMLPMax(128, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    outs = {}
    for impl in ("xla", "pallas"):
        mod = FusedPointMLPMax(128, dtype=jnp.bfloat16, impl=impl)
        out, _ = mod.apply(variables, x, train=True, bn_momentum=0.5,
                           mutable=["batch_stats"])
        outs[impl] = np.asarray(out, np.float32)
    np.testing.assert_allclose(outs["xla"], outs["pallas"],
                               rtol=2e-2, atol=2e-2)


def test_module_xla_path_matches_unfused_bitwise():
    """The composed-XLA path must reproduce PointMLP+max exactly (same
    arithmetic), so CPU behavior is unchanged by the fusion refactor."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 8), jnp.float32)
    variables = FusedPointMLPMax(128).init(
        jax.random.PRNGKey(0), x, train=False, bn_momentum=0.9)
    fused_out, fused_mut = FusedPointMLPMax(128, impl="xla").apply(
        variables, x, train=True, bn_momentum=0.5, mutable=["batch_stats"])
    plain_out, plain_mut = PointMLP(128).apply(
        variables, x, train=True, bn_momentum=0.5, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(fused_out),
                                  np.asarray(jnp.max(plain_out, axis=1)))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        fused_mut["batch_stats"], plain_mut["batch_stats"])


def test_encoder_grads_fused_vs_unfused():
    x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 3), jnp.float32)
    enc = PointNetEncoder()
    variables = enc.init(jax.random.PRNGKey(0), x, train=False,
                         bn_momentum=0.9)

    def loss(params, impl):
        mod = PointNetEncoder(head_impl=impl)
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, bn_momentum=0.9, mutable=["batch_stats"])
        return jnp.sum(out**2)

    gx = jax.grad(lambda p: loss(p, "xla"))(variables["params"])
    gp = jax.grad(lambda p: loss(p, "pallas"))(variables["params"])
    # Tolerances: the two paths compute batch statistics differently
    # (moment identity vs direct), and bias-type gradients through BN are
    # mathematically ~0 (pure cancellation), so their values are rounding
    # noise at the 1e-3 scale in both impls.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-3),
        gx, gp)


def test_fused_head_under_sharded_jit():
    """Pallas fused head composes with a batch-sharded GSPMD jit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointnet_autoencoder_tpu.parallel import mesh as meshlib

    mesh = meshlib.make_mesh()
    x, w, bias, gamma, beta = _inputs(b=8, n=16, c=4, f=128)
    mean, var = _batch_stats(x, w, bias)
    xs = jax.device_put(jnp.asarray(x), meshlib.batch_sharding(mesh))

    def loss(xa):
        return jnp.sum(fused_head.fused_dense_bn_relu_max(
            xa, w, bias, gamma, beta, mean, var, eps=EPS, impl="pallas"))

    out = jax.jit(jax.value_and_grad(loss))(xs)
    ref = jax.value_and_grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-5)
    np.testing.assert_allclose(out[1], ref[1], rtol=1e-5, atol=1e-6)
