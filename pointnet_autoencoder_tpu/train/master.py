"""Opt-in bfloat16 master parameters (``--bf16_params``).

The round-3 step profile (docs/ARCHITECTURE.md) leaves the flagship train
step loss-kernel-bound with one named lever remaining: parameter-class HBM
traffic. The decoder fc3 master weight alone is a (1024, N*3) f32 array --
25 MB at N=2048 -- read and rewritten by Adam every step, plus a bf16 cast
copy per matmul use; XLA's memory-space-assignment copies of that weight
class are the largest single item in the measured non-loss tail.

This module implements the experiment: store the *matmul* parameters
themselves in bfloat16 and apply the f32 optimizer update with STOCHASTIC
rounding, which keeps the expected update unbiased (E[round_sr(p + u)] =
p + u), so tiny updates accumulate in expectation instead of rounding to
zero against bf16's 8-bit mantissa (the failure mode of deterministic
bf16 masters).

Design decisions:

- Only matmul parameters (``dense``/``convt``/``conv`` kernels and biases)
  are cast. BatchNorm beta/gamma stay f32 -- project convention: losses,
  BN, and optimizer state are always f32.
- Optimizer math stays f32 and is bit-identical to the f32-master
  configuration: :func:`f32_math` upcasts gradients before the wrapped
  transformation and initializes its state from an f32 view of the
  params, so Adam's m/v are f32 and the computed update is exactly what
  the f32 master would receive. Only the stored weight rounds.
- Stochastic rounding uses the uint16-add bit trick: bf16 is the top
  half of an f32's bit pattern, so adding a uniform 16-bit integer to
  the f32 bits and truncating the low half rounds up with probability
  equal to the truncated fraction -- exact SR, two integer VPU ops.
- The per-step PRNG key is derived from the global step
  (``fold_in(_SR_BASE_KEY, step)``): deterministic, resume-stable, and
  requiring no state threading.

The reference has no analog (TF-1.4 trains pure f32); this exists so the
framework's bf16 story covers weights as well as matmuls. It is opt-in;
measured step time and fixture convergence are recorded in
docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# Module names whose kernel/bias leaves participate in matmuls and carry
# the parameter-traffic cost (nn/layers.py naming convention).
_MATMUL_MODULES = frozenset({"dense", "convt", "conv"})

_SR_BASE_KEY = 0x5EED


def _is_matmul_path(path) -> bool:
    return any(getattr(k, "key", None) in _MATMUL_MODULES for k in path)


def cast_master_bf16(params):
    """Cast matmul kernels/biases to bf16; leave BN (and any other)
    leaves f32."""
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: leaf.astype(jnp.bfloat16) if _is_matmul_path(p)
        else leaf,
        params,
    )


def f32_math(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap a transformation so its state and arithmetic are f32 even when
    params/grads are bf16: grads (and params, for transformations that
    read them) are upcast at the boundary, and ``init`` sees an f32 view
    so Adam/momentum slots are created f32."""

    def to_f32(tree):
        return jax.tree.map(lambda x: x.astype(jnp.float32), tree)

    def init(params):
        return tx.init(to_f32(params))

    def update(grads, state, params=None):
        p32 = None if params is None else to_f32(params)
        return tx.update(to_f32(grads), state, p32)

    return optax.GradientTransformation(init, update)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """f32 -> bf16 with stochastic rounding (unbiased: E[out] == x).

    bf16 is bitwise the high half of f32, so adding uniform 16-bit noise
    to the f32 bit pattern and truncating the low 16 bits implements
    round-up-with-probability-fraction exactly. A mantissa carry into the
    exponent field is the intended round-to-next-binade; non-finite
    inputs (where the carry would corrupt the NaN/inf payload) fall back
    to a plain cast.
    """
    xf = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    out = jnp.where(jnp.isfinite(xf), out, xf)
    return out.astype(jnp.bfloat16)


def apply_updates_sr(params, updates, step: jax.Array):
    """``optax.apply_updates`` with stochastic rounding into bf16 leaves.

    f32 (or other) leaves apply exactly as optax does (update cast to the
    param dtype); bf16 leaves accumulate in f32 and round stochastically
    with a per-leaf key derived from the global step.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    # rbg = the hardware RNG instruction. With the default threefry the
    # noise generation costs MORE than the traffic the bf16 master saves
    # (measured 2.85 vs 2.70 ms flagship step); with rbg the mode breaks
    # even-to-slightly-ahead (2.67 vs 2.72 ms) -- see ARCHITECTURE.md.
    base = jax.random.fold_in(
        jax.random.key(_SR_BASE_KEY, impl="rbg"), step
    )
    keys = jax.tree_util.tree_unflatten(
        treedef, list(jax.random.split(base, len(leaves)))
    )

    def apply(p, u, k):
        if p.dtype == jnp.bfloat16:
            return stochastic_round_bf16(
                p.astype(jnp.float32) + u.astype(jnp.float32), k
            )
        return (p + u.astype(p.dtype)).astype(p.dtype)

    return jax.tree.map(apply, params, updates, keys)


def bf16_moments(tx: optax.GradientTransformation
                 ) -> optax.GradientTransformation:
    """Store the optimizer's per-parameter moment slots for MATMUL params
    in bfloat16 (``--bf16_moments``).

    The round-4 flagship step sits at ~100-108% of its whole-program byte
    model; the remaining lever is fewer bytes (round-5 verdict #2), and
    after bf16 master weights the largest named parameter-class traffic is
    Adam's f32 m/v -- 2 x ~8.4M f32 = ~67 MB read AND rewritten every
    step for the matmul class (fc3 alone carries 2 x 25 MB). This wrapper
    halves that: moments are stored bf16 and upcast to f32 at the
    arithmetic boundary, so the Adam math itself is unchanged f32.

    The downcast uses STOCHASTIC rounding (same uint16-add trick as the
    bf16 master params, keys threaded from a wrapper-owned step counter):
    a deterministic bf16 EMA stalls once its per-step increment falls
    under half an ulp -- nu's relative increment is ~(1-b2)=1e-3 against
    bf16's ~3.9e-3 half-ulp, i.e. nu would FREEZE at convergence-scale
    values -- while the stochastic round keeps E[EMA] exact.

    Only f32 leaves on matmul-module paths are cast (count stays int32,
    BN-parameter moments stay f32, mirroring cast_master_bf16's class
    split). Composes with :func:`f32_math` in either order; the Trainer
    applies it outermost. The reference's Adam is pure f32
    (train.py:117-121) -- beating it everywhere includes optimizer
    traffic.
    """

    def down(state, key):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        keys = list(jax.random.split(key, len(leaves)))
        keyed = jax.tree_util.tree_unflatten(treedef, keys)

        def cast(path, x, k):
            if _is_matmul_path(path) and x.dtype == jnp.float32:
                return stochastic_round_bf16(x, k)
            return x

        return jax.tree_util.tree_map_with_path(cast, state, keyed)

    def up(state):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, state)

    def init(params):
        # First downcast is exact for adam's zero-init moments (0.0 is
        # representable), so plain cast -- no key needed at init.
        inner = tx.init(params)
        return (jnp.zeros((), jnp.int32), jax.tree_util.tree_map_with_path(
            lambda p, x: x.astype(jnp.bfloat16)
            if (_is_matmul_path(p) and x.dtype == jnp.float32) else x,
            inner))

    def update(grads, state, params=None):
        count, inner = state
        updates, new_inner = tx.update(grads, up(inner), params)
        key = jax.random.fold_in(
            jax.random.key(_SR_BASE_KEY ^ 0x3A7, impl="rbg"), count)
        return updates, (count + 1, down(new_inner, key))

    return optax.GradientTransformation(init, update)
