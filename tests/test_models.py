"""Model smoke + gradient tests for all six configs.

Generalizes the reference's __main__ graph checks (models/*.py) with real
assertions: output geometry, end_points keys, loss finiteness, and gradient
flow to every parameter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet_autoencoder_tpu.models.registry import (
    available_models,
    get_model_spec,
)

# Small point count keeps CPU tests fast; upconv configs are pinned to 2048
# so they run at a reduced batch instead.
CONFIGS = [
    ("model", 256, 4),
    ("model_cpu", 256, 4),
    ("model_emd", 256, 4),
    ("model_upconv", 2048, 2),
    ("model_fc_upconv", 2048, 2),
    ("model_hierachy", 256, 4),
]


def test_registry_lists_all_reference_configs():
    assert available_models() == [
        "model", "model_cpu", "model_emd", "model_fc_upconv",
        "model_hierachy", "model_upconv",
    ]
    with pytest.raises(KeyError):
        get_model_spec("nope")


@pytest.mark.parametrize("name,n,b", CONFIGS)
def test_forward_shapes_and_end_points(name, n, b):
    spec = get_model_spec(name)
    model, variables = spec.init_variables(jax.random.PRNGKey(0), n, b)
    pts = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3))
    pred, ep = model.apply(variables, pts, train=False, bn_momentum=0.9)
    assert pred.shape == (b, n, 3)
    assert "embedding" in ep
    expected_dim = {"model": 1024, "model_cpu": 1024, "model_emd": 1024,
                    "model_upconv": 1024, "model_fc_upconv": 512,
                    "model_hierachy": 512}[name]
    assert ep["embedding"].shape == (b, expected_dim)
    if name == "model_upconv":
        assert ep["xyzmap"].shape == (b, 32, 64, 3)
    if name == "model_fc_upconv":
        assert ep["xyzmap"].shape == (b, 32, 32, 3)
    if name == "model_hierachy":
        assert ep["pc1_xyz"].shape == (b, 64, 3)


@pytest.mark.parametrize("name,n,b", CONFIGS)
def test_loss_and_gradient_flow(name, n, b):
    spec = get_model_spec(name)
    model, variables = spec.init_variables(jax.random.PRNGKey(0), n, b)
    pts = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3))

    def loss_fn(params):
        (pred, ep), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, train=True, bn_momentum=0.9, mutable=["batch_stats"],
        )
        loss, _ = spec.loss_fn(pred, pts, ep)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # Every parameter receives gradient signal (nonzero somewhere).
    nonzero = [float(jnp.max(jnp.abs(g))) > 0 for g in flat]
    assert all(nonzero), f"{sum(nonzero)}/{len(nonzero)} params got gradient"


@pytest.mark.parametrize("name,n,b", CONFIGS)
def test_decoder_subtree_application_matches_full_forward(name, n, b):
    """The standalone decoder module applied against the 'decoder' variable
    sub-tree must reproduce the full forward's prediction from the
    published embedding — the invariant InferenceSession.decode relies on,
    for every decoder family."""
    from pointnet_autoencoder_tpu.models.autoencoder import DECODERS

    spec = get_model_spec(name)
    model, variables = spec.init_variables(jax.random.PRNGKey(0), n, b)
    pts = jax.random.normal(jax.random.PRNGKey(1), (b, n, 3))
    pred, ep = model.apply(variables, pts, train=False, bn_momentum=0.9)

    decoder = DECODERS[spec.decoder](n)
    dec_vars = {
        "params": variables["params"]["decoder"],
        "batch_stats": variables.get("batch_stats", {}).get("decoder", {}),
    }
    pred2, _ = decoder.apply(dec_vars, ep["embedding"], False, 0.9)
    np.testing.assert_allclose(np.asarray(pred2), np.asarray(pred),
                               rtol=1e-6, atol=1e-6)


def test_point_constraints_enforced():
    with pytest.raises(ValueError):
        get_model_spec("model_upconv").make(1024)
    with pytest.raises(ValueError):
        get_model_spec("model_hierachy").make(100)
    get_model_spec("model_hierachy").make(128)  # 128 % 64 == 0: fine


def test_eval_deterministic_and_batch_stats_frozen():
    spec = get_model_spec("model")
    model, variables = spec.init_variables(jax.random.PRNGKey(0), 128, 2)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3))
    p1, _ = model.apply(variables, pts, train=False, bn_momentum=0.9)
    p2, _ = model.apply(variables, pts, train=False, bn_momentum=0.9)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_train_updates_batch_stats():
    spec = get_model_spec("model")
    model, variables = spec.init_variables(jax.random.PRNGKey(0), 128, 2)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 3)) + 5.0
    _, mutated = model.apply(variables, pts, train=True, bn_momentum=0.5,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b_))
        for a, b_ in zip(before, after)
    )
    assert changed
