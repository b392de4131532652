"""Op micro-benchmarks: the reference's embedded harnesses, made honest.

Replicates the workload of the reference Chamfer self-benchmark
(tf_nndistance.py:40-66: 100 gradient-descent steps on random 32x16384x3 vs
32x1024x3 clouds, per-step wall time) and adds an EMD equivalent, using the
fetch-synchronized timing this backend requires.

    python -m pointnet_autoencoder_tpu.ops.benchmarks [--quick]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.ops import chamfer, emd


def bench_chamfer_gd(b=32, n=16384, m=1024, steps=100, lr=0.05,
                     impl=None) -> dict:
    """GD on sum(dist1)+sum(dist2) wrt the first cloud (the reference's
    exact objective, tf_nndistance.py:55-57)."""
    xyz1 = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3))
    xyz2 = jax.random.normal(jax.random.PRNGKey(1), (b, m, 3))

    # Both clouds are jit ARGUMENTS: a closed-over-constant gather/scatter
    # graph produces deterministically wrong results on the axon backend
    # (CLAUDE.md environment gotchas).
    @jax.jit
    def step(p, tgt):
        def loss(q):
            d1, _, d2, _ = chamfer.nn_distance(q, tgt, impl=impl)
            return jnp.sum(d1) + jnp.sum(d2)

        l, g = jax.value_and_grad(loss)(p)
        return p - lr * g, l

    p, l = step(xyz1, xyz2)
    float(l)  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        p, l = step(p, xyz2)
    final = float(l)  # barrier
    dt = (time.perf_counter() - t0) / steps
    return {"ms_per_step": dt * 1e3, "final_loss": final,
            "config": f"chamfer GD b{b} n{n} m{m}"}


def bench_emd_gd(b=8, n=1024, m=1024, steps=20, lr=0.01, impl=None) -> dict:
    xyz2 = jax.random.uniform(jax.random.PRNGKey(1), (b, m, 3))
    xyz1 = jax.random.uniform(jax.random.PRNGKey(0), (b, n, 3))

    @jax.jit
    def step(p, tgt):
        l, g = jax.value_and_grad(
            lambda q: jnp.sum(emd.emd_cost(q, tgt, impl=impl))
        )(p)
        return p - lr * g, l

    p, l = step(xyz1, xyz2)
    float(l)
    t0 = time.perf_counter()
    for _ in range(steps):
        p, l = step(p, xyz2)
    final = float(l)
    dt = (time.perf_counter() - t0) / steps
    return {"ms_per_step": dt * 1e3, "final_loss": final,
            "config": f"emd GD b{b} n{n} m{m}"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="smaller clouds / fewer steps")
    args = ap.parse_args(argv)
    if args.quick:
        runs = [
            bench_chamfer_gd(b=4, n=2048, m=512, steps=20),
            bench_emd_gd(b=2, n=256, m=256, steps=5),
        ]
    else:
        runs = [
            bench_chamfer_gd(),           # the reference harness workload
            bench_chamfer_gd(n=2048, m=2048),  # the training workload
            bench_emd_gd(),
        ]
    for r in runs:
        print(f"{r['config']}: {r['ms_per_step']:.3f} ms/step, "
              f"final loss {r['final_loss']:.2f}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
