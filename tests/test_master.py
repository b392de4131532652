"""bf16 master-weight mode (train/master.py, --bf16_params).

Pins: exact stochastic-rounding semantics (unbiased, exact on
representable values, non-finite guard), selective casting (matmul leaves
only; BN stays f32), f32 optimizer arithmetic under bf16 params, and the
end-to-end Trainer path including checkpoint resume.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pointnet_autoencoder_tpu.config import TrainConfig
from pointnet_autoencoder_tpu.data import synthetic
from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.train import master


# -- stochastic rounding ------------------------------------------------------


def test_sr_exact_on_representable_values():
    # Values already representable in bf16 must round to themselves for
    # every key (zero noise cannot carry).
    vals = jnp.asarray([0.0, 1.0, -2.5, 0.15625, 3.0e38, -1e-38], jnp.float32)
    vals = vals.astype(jnp.bfloat16).astype(jnp.float32)  # snap to bf16 grid
    for seed in range(5):
        out = master.stochastic_round_bf16(vals, jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(vals, np.float32)
        )


def test_sr_unbiased_between_neighbors():
    # x = lo + frac * (hi - lo) for bf16 neighbors lo < hi: P(round up)
    # must equal frac, and E[out] must equal x.
    lo = jnp.float32(1.0)
    hi = jnp.float32(1.0 + 2.0 ** -7)  # next bf16 above 1.0 (7-bit mantissa)
    frac = 0.25
    x = jnp.full((4096,), (1 - frac) * lo + frac * hi, jnp.float32)
    ups = 0
    total = 0
    acc = 0.0
    for seed in range(16):
        out = np.asarray(
            master.stochastic_round_bf16(x, jax.random.PRNGKey(seed)),
            np.float32,
        )
        assert set(np.unique(out)) <= {float(lo), float(hi)}
        ups += int((out == float(hi)).sum())
        total += out.size
        acc += float(out.mean())
    p_up = ups / total
    assert abs(p_up - frac) < 0.01
    mean = acc / 16
    expect = float(x[0])
    step = float(hi) - float(lo)
    assert abs(mean - expect) < 0.02 * step


def test_sr_negative_symmetry_and_neighbor_bound():
    # Sign lives outside the magnitude bits the noise perturbs, so
    # sr(-x, key) == -sr(x, key) bit-for-bit; and for any finite x the
    # result is one of x's two enclosing bf16 neighbors.
    x = jax.random.normal(jax.random.PRNGKey(7), (4096,), jnp.float32) * 3.0
    key = jax.random.PRNGKey(11)
    up = np.asarray(master.stochastic_round_bf16(x, key), np.float32)
    dn = np.asarray(master.stochastic_round_bf16(-x, key), np.float32)
    np.testing.assert_array_equal(up, -dn)
    xf = np.asarray(x, np.float32)
    # Neighbor bound: |sr(x) - x| <= one bf16 ulp at x (conservative form
    # |bf16(x)| * 2^-7, which upper-bounds the true ulp in every binade).
    ulp = np.abs(
        np.asarray(jnp.asarray(xf, jnp.bfloat16), np.float32)
    ) * 2.0 ** -7 + 1e-45
    assert np.all(np.abs(up - xf) <= ulp * 1.0000001)


def test_sr_nonfinite_guard():
    x = jnp.asarray([jnp.inf, -jnp.inf, jnp.nan, 1.0], jnp.float32)
    out = np.asarray(master.stochastic_round_bf16(x, jax.random.PRNGKey(0)),
                     np.float32)
    assert out[0] == np.inf and out[1] == -np.inf and np.isnan(out[2])
    assert out[3] == 1.0


# -- selective casting --------------------------------------------------------


def test_cast_master_bf16_selective():
    spec = get_model_spec("model")
    _, variables = spec.init_variables(jax.random.PRNGKey(0), 128)
    params = master.cast_master_bf16(variables["params"])

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    saw_dense = saw_bn = False
    for path, leaf in flat:
        keys = tuple(k.key for k in path)
        if any(k in ("dense", "convt", "conv") for k in keys):
            assert leaf.dtype == jnp.bfloat16, keys
            saw_dense = True
        elif "bn" in keys:
            assert leaf.dtype == jnp.float32, keys
            saw_bn = True
    assert saw_dense and saw_bn


# -- f32 optimizer arithmetic -------------------------------------------------


def test_f32_math_state_dtype_and_update_parity():
    params32 = {"dense": {"kernel": jnp.ones((4, 3), jnp.float32) * 0.3}}
    params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params32)
    grads32 = {"dense": {"kernel": jnp.full((4, 3), 0.017, jnp.float32)}}
    grads16 = jax.tree.map(lambda g: g.astype(jnp.bfloat16), grads32)

    tx = optax.adam(1e-3)
    wrapped = master.f32_math(tx)

    state16 = wrapped.init(params16)
    for leaf in jax.tree.leaves(state16):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32

    # Same grads (bf16 grads chosen exactly representable? 0.017 is not --
    # compare against adam fed the same bf16-rounded values upcast).
    g32_equiv = jax.tree.map(lambda g: g.astype(jnp.float32), grads16)
    u_ref, _ = tx.update(g32_equiv, tx.init(params32), params32)
    u16, _ = wrapped.update(grads16, state16, params16)
    for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u16)):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_apply_updates_sr_mixed_tree():
    params = {
        "dense": {"kernel": jnp.ones((8, 8), jnp.bfloat16)},
        "bn": {"gamma": jnp.ones((8,), jnp.float32)},
    }
    updates = {
        "dense": {"kernel": jnp.full((8, 8), 1e-4, jnp.float32)},
        "bn": {"gamma": jnp.full((8,), 1e-4, jnp.float32)},
    }
    new = master.apply_updates_sr(params, updates, jnp.asarray(3, jnp.int32))
    assert new["dense"]["kernel"].dtype == jnp.bfloat16
    assert new["bn"]["gamma"].dtype == jnp.float32
    # f32 leaf applies exactly.
    np.testing.assert_allclose(np.asarray(new["bn"]["gamma"]), 1.0 + 1e-4)
    # bf16 leaf: each element is one of the two bf16 neighbors of 1 + 1e-4.
    vals = np.unique(np.asarray(new["dense"]["kernel"], np.float32))
    assert set(vals) <= {1.0, 1.0 + 2.0 ** -7}
    # Deterministic in the step (resume-stable).
    again = master.apply_updates_sr(params, updates, jnp.asarray(3, jnp.int32))
    np.testing.assert_array_equal(
        np.asarray(again["dense"]["kernel"], np.float32),
        np.asarray(new["dense"]["kernel"], np.float32),
    )


def test_sr_accumulates_tiny_updates():
    # The motivating failure mode: a deterministic bf16 cast of p + u with
    # u ~ 1e-3 ulp rounds to p forever; SR accumulates in expectation.
    p = jnp.full((2048,), 1.0, jnp.bfloat16)
    u = jnp.full((2048,), 1e-3 * 2.0 ** -7, jnp.float32)  # ~1e-3 ulp at 1.0
    cur = {"w": p}
    for step in range(400):
        cur = master.apply_updates_sr(cur, {"w": u},
                                      jnp.asarray(step, jnp.int32))
    drift = float(np.mean(np.asarray(cur["w"], np.float32))) - 1.0
    expect = 400 * float(u[0])
    assert drift == pytest.approx(expect, rel=0.25)
    # Deterministic rounding never moves.
    det = (p.astype(jnp.float32) + u).astype(jnp.bfloat16)
    assert float(np.mean(np.asarray(det, np.float32))) == 1.0


# -- end-to-end ---------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_master")
    return synthetic.write_fixture(str(root), shapes_per_category=48,
                                   points_per_shape=80, seed=0)


def test_trainer_bf16_params_end_to_end(fixture_root, tmp_path):
    """Two epochs with --bf16_params: params stay bf16 through the jitted
    step, loss is finite and improves, checkpoints resume with dtypes
    intact."""
    from pointnet_autoencoder_tpu.train.loop import Trainer

    log_dir = str(tmp_path / "log")
    cfg = TrainConfig(
        model="model", category="Chair", log_dir=log_dir, num_point=64,
        max_epoch=2, batch_size=8, data_path=fixture_root, seed=0,
        log_every=1, bf16_params=True,
    )
    trainer = Trainer(cfg)

    def matmul_dtypes(params):
        return {
            tuple(k.key for k in path): leaf.dtype
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }

    before = matmul_dtypes(trainer.state.params)
    assert any(dt == jnp.bfloat16 for dt in before.values())
    best = trainer.train()
    assert np.isfinite(best)
    after = matmul_dtypes(trainer.state.params)
    assert before == after  # dtypes preserved through jitted steps
    # Adam moments are f32 (f32_math wrapper).
    for leaf in jax.tree.leaves(trainer.state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32

    # Resume restores bf16 leaves.
    cfg2 = TrainConfig(**{**cfg.__dict__, "max_epoch": 3, "resume": True})
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch >= 1
    assert matmul_dtypes(trainer2.state.params) == after
    trainer2.close()


def test_bf16_params_composes_with_model_parallel(fixture_root, tmp_path):
    """--bf16_params on a 4dp x 2tp mesh: bf16 decoder weights shard over
    the 'model' axis and one epoch trains to a finite loss."""
    from jax.sharding import PartitionSpec as P

    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(
        model="model", category="Chair", log_dir=str(tmp_path / "log_tp"),
        num_point=64, max_epoch=1, batch_size=8, data_path=fixture_root,
        seed=0, log_every=10, bf16_params=True,
        data_parallel=4, model_parallel=2,
    )
    trainer = Trainer(cfg)
    fc1 = trainer.state.params["decoder"]["fc1"]["dense"]["kernel"]
    assert fc1.dtype == jnp.bfloat16
    assert fc1.sharding.spec == P(None, "model")  # column-sharded bf16 leaf
    best = trainer.train()
    assert np.isfinite(best)


def test_bf16_params_losses_comparable_to_f32_master(fixture_root, tmp_path):
    """Same seed, same data: after two epochs the bf16-master run's eval
    loss lands in the same regime as the f32-master run (the weights only
    differ by unbiased rounding noise)."""
    from pointnet_autoencoder_tpu.train.loop import Trainer

    losses = {}
    for name, flag in (("f32", False), ("bf16", True)):
        cfg = TrainConfig(
            model="model", category="Chair",
            log_dir=str(tmp_path / f"log_{name}"), num_point=64,
            max_epoch=2, batch_size=8, data_path=fixture_root, seed=0,
            log_every=10, bf16_params=flag,
        )
        losses[name] = Trainer(cfg).train()
    assert np.isfinite(losses["bf16"])
    # Coarse envelope: within 2x of each other after 2 epochs.
    assert losses["bf16"] < 2.0 * losses["f32"] + 1e-6


# -- bf16 Adam moments (--bf16_moments, round 5) ------------------------------


def _moment_dtypes(opt_state):
    return {
        tuple(getattr(k, "key", getattr(k, "name", k)) for k in path):
            leaf.dtype
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]
        if hasattr(leaf, "dtype")
    }


def test_bf16_moments_state_dtypes():
    """Matmul-path moment slots store bf16; BN moments and count do not."""
    params = {
        "conv": {"kernel": jnp.zeros((8, 16), jnp.float32)},
        "bn": {"scale": jnp.zeros((16,), jnp.float32)},
    }
    tx = master.bf16_moments(optax.adam(1e-3))
    state = tx.init(params)
    count, inner = state
    assert count.dtype == jnp.int32
    dts = _moment_dtypes(inner)
    for path, dt in dts.items():
        if "conv" in path:
            assert dt == jnp.bfloat16, path
        elif "scale" in path:
            assert dt == jnp.float32, path


def test_bf16_moments_update_tracks_f32_adam():
    """A few steps of bf16-moment Adam stay close to pure-f32 Adam: the
    arithmetic is f32 (moments upcast at the boundary), only the stored
    moments round -- stochastically, so no EMA stall."""
    rng = np.random.RandomState(0)
    params = {"conv": {"kernel": jnp.asarray(
        rng.randn(32, 64).astype(np.float32))}}
    g = {"conv": {"kernel": jnp.asarray(
        0.1 * rng.randn(32, 64).astype(np.float32))}}
    tx32 = optax.adam(1e-3)
    tx16 = master.bf16_moments(optax.adam(1e-3))
    s32, s16 = tx32.init(params), tx16.init(params)
    p32 = p16 = params
    for _ in range(5):
        u32, s32 = tx32.update(g, s32, p32)
        p32 = optax.apply_updates(p32, u32)
        u16, s16 = tx16.update(g, s16, p16)
        p16 = optax.apply_updates(p16, u16)
    a = np.asarray(p32["conv"]["kernel"])
    b = np.asarray(p16["conv"]["kernel"])
    # Update magnitudes are ~lr; moment rounding perturbs them ~2^-9 rel.
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_bf16_moments_no_ema_stall():
    """The motivating failure mode: nu's per-step relative increment
    (1-b2 = 1e-3) is below bf16's half-ulp, so a DETERMINISTIC bf16 EMA
    freezes. With stochastic rounding the EMA keeps moving in
    expectation: feeding a gradient 2x larger than the stored-nu scale
    must grow nu."""
    params = {"conv": {"kernel": jnp.ones((512, 512), jnp.float32)}}
    tx = master.bf16_moments(optax.adam(1e-3))
    state = tx.init(params)
    g = {"conv": {"kernel": jnp.full((512, 512), 0.1, jnp.float32)}}
    # Warm nu to ~0.01^2-scale, then switch to a 2x gradient.
    for _ in range(30):
        _, state = tx.update(g, state, params)
    nu_before = float(jnp.mean(jnp.asarray(
        state[1][0].nu["conv"]["kernel"], jnp.float32)))
    g2 = {"conv": {"kernel": jnp.full((512, 512), 0.2, jnp.float32)}}
    for _ in range(30):
        _, state = tx.update(g2, state, params)
    nu_after = float(jnp.mean(jnp.asarray(
        state[1][0].nu["conv"]["kernel"], jnp.float32)))
    assert nu_after > 1.5 * nu_before, (nu_before, nu_after)


def test_trainer_bf16_moments_end_to_end(fixture_root, tmp_path):
    """Two epochs with --bf16_moments (+ --bf16_params: the full
    reduced-traffic configuration): finite improving loss, bf16 moment
    slots preserved through the jitted donated step, resume intact."""
    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(
        model="model", category="Chair", log_dir=str(tmp_path / "log"),
        num_point=64, max_epoch=2, batch_size=8, data_path=fixture_root,
        seed=0, log_every=1, bf16_params=True, bf16_moments=True,
    )
    trainer = Trainer(cfg)
    count, inner = trainer.state.opt_state
    assert any(dt == jnp.bfloat16 for dt in _moment_dtypes(inner).values())
    best = trainer.train()
    assert np.isfinite(best)
    count, inner = trainer.state.opt_state
    dts = _moment_dtypes(inner)
    assert any(dt == jnp.bfloat16 for dt in dts.values())
    trainer.close()

    cfg2 = TrainConfig(**{**cfg.__dict__, "max_epoch": 3, "resume": True})
    trainer2 = Trainer(cfg2)
    assert trainer2.start_epoch >= 1
    _, inner2 = trainer2.state.opt_state
    assert _moment_dtypes(inner2) == dts
    trainer2.close()
