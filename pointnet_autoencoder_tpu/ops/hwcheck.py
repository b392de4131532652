"""On-hardware kernel parity check: every Pallas op vs its numpy oracle.

The pytest suite runs the kernels in interpret mode on a CPU backend
(tests/conftest.py); this module is the complementary check that the
*compiled* kernels on the attached accelerator still match the
independent host oracles (ops/oracles.py). Run it after kernel changes or
on a new jaxlib/libtpu:

    python -m pointnet_autoencoder_tpu.ops.hwcheck

Prints one PASS/FAIL line per contract and exits nonzero on any failure.
Methodology (CLAUDE.md): inputs are always passed as jit ARGUMENTS (a
zero-arg jitted closure over device arrays produced wrong gather/scatter
results on the axon backend), and comparisons are against numpy, never
against another on-device program.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_autoencoder_tpu.ops import chamfer, emd, fused_encoder, \
    fused_head, oracles

_FAILURES = []


def _check(name: str, err: float, tol: float, extra: str = ""):
    ok = bool(err <= tol)
    print(f"{'PASS' if ok else 'FAIL'}  {name}: max err {err:.3e} "
          f"(tol {tol:.0e}){' ' + extra if extra else ''}")
    if not ok:
        _FAILURES.append(name)


def _maxerr(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float64)
                               - np.asarray(b, np.float64))))


def check_chamfer(b=4, n=500, m=388, seed=0, impls=("pallas", "xla"),
                  tag=""):
    """Forward (dist exact-ish, idx exact) + analytic VJP, both impls,
    non-tile-multiple N != M on purpose (exercises kernel padding)."""
    rng = np.random.RandomState(seed)
    x1 = rng.randn(b, n, 3).astype(np.float32)
    x2 = rng.randn(b, m, 3).astype(np.float32)
    g1 = rng.randn(b, n).astype(np.float32)
    g2 = rng.randn(b, m).astype(np.float32)
    rd1, ri1, rd2, ri2 = oracles.nn_distance_np(x1, x2)
    rgx1, rgx2 = oracles.nn_distance_grad_np(x1, x2, ri1, ri2, g1, g2)
    for impl in impls:
        fwd = jax.jit(lambda a, c: chamfer.nn_distance(a, c, impl=impl))
        d1, i1, d2, i2 = jax.device_get(fwd(x1, x2))
        _check(f"chamfer[{impl}]{tag} dist", max(_maxerr(d1, rd1),
                                                 _maxerr(d2, rd2)), 1e-5)
        idx_ok = int(np.sum(i1 != ri1) + np.sum(i2 != ri2))
        _check(f"chamfer[{impl}]{tag} idx (mismatches)", float(idx_ok), 0.0)

        def scalarized(a, c, ga, gc):
            d1_, _, d2_, _ = chamfer.nn_distance(a, c, impl=impl)
            return jnp.sum(d1_ * ga) + jnp.sum(d2_ * gc)

        gx1, gx2 = jax.device_get(jax.jit(
            jax.grad(scalarized, argnums=(0, 1)))(x1, x2, g1, g2))
        _check(f"chamfer[{impl}]{tag} grad", max(_maxerr(gx1, rgx1),
                                                 _maxerr(gx2, rgx2)), 5e-5)


def check_emd(b=2, n=256, m=192, seed=1):
    """Annealed matching, cost, and fused cost+grads vs the GPU-semantics
    oracle, unequal cloud sizes (integer capacity factors)."""
    rng = np.random.RandomState(seed)
    x1 = rng.rand(b, n, 3).astype(np.float32)
    x2 = rng.rand(b, m, 3).astype(np.float32)
    rmatch = oracles.approx_match_np(x1, x2)
    rcost = oracles.match_cost_np(x1, x2, rmatch)
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, rmatch)

    match = jax.device_get(jax.jit(emd.approx_match)(x1, x2))
    _check("emd approx_match", _maxerr(match, rmatch), 1e-3)
    cost = jax.device_get(jax.jit(emd.match_cost)(x1, x2, jnp.asarray(rmatch)))
    _check("emd match_cost", _maxerr(cost, rcost) / max(float(rcost.max()),
                                                        1.0), 1e-4,
           extra="(relative)")

    def fused_sum(a, c):
        return jnp.sum(emd.emd_cost(a, c))

    fcost = jax.device_get(jax.jit(emd.emd_cost)(x1, x2))
    _check("emd fused cost", _maxerr(fcost, rcost) / max(float(rcost.max()),
                                                         1.0), 2e-3,
           extra="(relative)")
    g1, g2 = jax.device_get(jax.jit(jax.grad(fused_sum, argnums=(0, 1)))(
        x1, x2))
    scale = max(float(np.abs(rg1).max()), float(np.abs(rg2).max()))
    _check("emd fused grads", max(_maxerr(g1, rg1), _maxerr(g2, rg2)) / scale,
           5e-3, extra="(relative to grad max)")


def check_fused_head(b=3, n=96, c=16, f=128, seed=2):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, n, c).astype(np.float32)
    w = (rng.randn(c, f) * 0.3).astype(np.float32)
    bias = (rng.randn(f) * 0.1).astype(np.float32)
    gamma = (1.0 + 0.2 * rng.randn(f)).astype(np.float32)
    beta = (0.1 * rng.randn(f)).astype(np.float32)
    y = x.reshape(-1, c) @ w + bias
    mean = y.mean(0).astype(np.float32)
    var = (np.mean(y * y, axis=0) - mean * mean).astype(np.float32)
    rmax, rarg = oracles.fused_head_np(x, w, bias, gamma, beta, mean, var)
    out = jax.device_get(jax.jit(
        lambda *a: fused_head.fused_dense_bn_relu_max(*a, impl="pallas")
    )(x, w, bias, gamma, beta, mean, var))
    _check("fused_head fwd", _maxerr(out, rmax), 1e-5)


def check_fused_encoder(b=2, n=64, seed=3):
    """Whole-encoder eval kernel vs a float64 numpy walk of the chain."""
    rng = np.random.RandomState(seed)
    widths = (64, 64, 64, 128, 1024)
    pts = rng.randn(b, n, 3).astype(np.float32)
    layers, ref, c = [], pts.astype(np.float64), 3
    jl = []
    for fw in widths:
        w = (rng.randn(c, fw) * 0.3).astype(np.float32)
        bias = (rng.randn(fw) * 0.1).astype(np.float32)
        gamma = (1.0 + 0.2 * rng.randn(fw)).astype(np.float32)
        beta = (0.1 * rng.randn(fw)).astype(np.float32)
        mean = (0.05 * rng.randn(fw)).astype(np.float32)
        var = (1.0 + 0.1 * rng.rand(fw)).astype(np.float32)
        inv = gamma / np.sqrt(var + 1e-3)
        ref = np.maximum((ref @ w) * inv + (bias - mean) * inv + beta, 0.0)
        jl.append(tuple(map(jnp.asarray, (w, bias, gamma, beta, mean, var))))
        c = fw
    ref = ref.max(axis=1)
    # Layers go in as jit ARGUMENTS, not closure constants: a closed-over
    # graph constant-folds into a different executable than the arg-passing
    # program InferenceSession compiles (and on axon, closure-constant
    # gather graphs have produced wrong numerics — see CLAUDE.md).
    out = jax.device_get(jax.jit(fused_encoder.fused_encoder_eval)(pts, jl))
    _check("fused_encoder eval fwd", _maxerr(out, ref), 1e-4)


def check_emd_large_n(b=1, n=16384, m=16384, seed=4):
    """The large-N regime past round-3's N<=8192 kernel envelope (verdict
    item #3): both non-materializing paths -- the fused kernel (d2
    recompute branch; the cache cannot hold (16384, 16384)) and the
    streaming row-chunked XLA path -- against the numpy oracle at the SAME
    shape. The oracle materializes (N, M) on the 125 GB host, which the
    16 GB device deliberately never does. Slow (~minutes: the oracle's 10
    annealing levels over 268M pairs); opt in via --large_n."""
    rng = np.random.RandomState(seed)
    x1 = rng.rand(b, n, 3).astype(np.float32)
    x2 = rng.rand(b, m, 3).astype(np.float32)
    rmatch = oracles.approx_match_np(x1, x2)
    rcost = oracles.match_cost_np(x1, x2, rmatch)
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, rmatch)
    del rmatch
    scale = max(float(np.abs(rg1).max()), float(np.abs(rg2).max()))

    for impl in ("pallas", "chunked"):
        cost, g1, g2 = jax.device_get(jax.jit(
            lambda a, c: emd._emd_forward_any(a, c, impl)
        )(x1, x2))
        _check(f"emd[{impl}] large-N cost (B={b}, N={n}, M={m})",
               _maxerr(cost, rcost) / max(float(rcost.max()), 1.0), 2e-3,
               extra="(relative)")
        _check(f"emd[{impl}] large-N grads",
               max(_maxerr(g1, rg1), _maxerr(g2, rg2)) / scale, 5e-3,
               extra="(relative to grad max)")


def check_emd_large_prime_n(b=1, n=12289, m=12289, seed=8):
    """Streaming EMD at a large PRIME N (round-5 verdict #4): 12289 has no
    divisors, so the old chunking degenerated to an N-iteration scan; the
    bounded-chunk + zero-capacity-padding path must stream it in <= 64
    chunks and match the numpy oracle. Also covers the kernel's decline
    (no 8-multiple tile divides a prime) feeding the auto-route. Slow
    (host oracle at 151M pairs); opt in via --large_n."""
    from pointnet_autoencoder_tpu.ops import emd_pallas

    assert emd_pallas.emd_forward_pallas(
        np.zeros((b, n, 3), np.float32), np.zeros((b, m, 3), np.float32)
    ) is None
    rng = np.random.RandomState(seed)
    x1 = rng.rand(b, n, 3).astype(np.float32)
    x2 = rng.rand(b, m, 3).astype(np.float32)
    rmatch = oracles.approx_match_np(x1, x2)
    rcost = oracles.match_cost_np(x1, x2, rmatch)
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, rmatch)
    del rmatch
    scale = max(float(np.abs(rg1).max()), float(np.abs(rg2).max()))
    cost, g1, g2 = jax.device_get(jax.jit(
        lambda a, c: emd._emd_forward_any(a, c, "chunked"))(x1, x2))
    _check(f"emd[chunked] large-prime-N cost (B={b}, N={n}, M={m})",
           _maxerr(cost, rcost) / max(float(rcost.max()), 1.0), 2e-3,
           extra="(relative)")
    _check("emd[chunked] large-prime-N grads",
           max(_maxerr(g1, rg1), _maxerr(g2, rg2)) / scale, 5e-3,
           extra="(relative to grad max)")


def check_emd_route_boundary():
    """The kernel->streaming auto-route boundary, in the DEFAULT sweep
    (round-5 verdict #6: the routing decision used to be exercised only by
    the opt-in --large_n run, so a regression would ship silently).

    Two cheap parts:
    (1) Routing decisions, host-side (shape logic only, no device work):
        just past the VMEM envelope the kernel wrapper must decline
        (emd_forward_pallas -> None) and the byte limit must route the
        fallback to the STREAMING path, with a bounded chunk count
        (ops/emd.py:323-338 auto-route; _pick_row_chunk round-5 contract).
    (2) The streaming program itself compiled on the attached accelerator
        vs the numpy oracle at a small NON-divisible-N shape -- covers the
        round-5 zero-capacity row padding in the compiled program without
        the minutes-scale 16384^2 oracle (that stays in --large_n).
    """
    from pointnet_autoencoder_tpu.ops import emd_pallas

    # (1a) N=M=32768: uncached VMEM footprint exceeds the cap -> kernel
    # declines; numpy arrays so the check costs no device programs.
    big1 = np.zeros((1, 32768, 3), np.float32)
    big2 = np.zeros((1, 32768, 3), np.float32)
    declined = emd_pallas.emd_forward_pallas(big1, big2) is None
    _check("emd route: kernel declines past VMEM envelope",
           0.0 if declined else 1.0, 0.0)
    # (1b) ...and the fallback streams rather than materializing (B,N,M).
    streams = 4 * 1 * 32768 * 32768 > emd._DENSE_BYTES_LIMIT
    _check("emd route: past-envelope shape streams (no dense (B,N,M))",
           0.0 if streams else 1.0, 0.0)
    # Budget-first chunk contract (review fix): the working buffer never
    # exceeds the 256 MB budget beyond the 8-row sublane floor, and the
    # chunk count stays <= 64 whenever the budget admits n/64 rows per
    # chunk (true for this shape; NOT an unconditional bound -- extreme
    # B*M trades count for budget safety, see _pick_row_chunk).
    budget = 256 * 1024 * 1024
    b_, n_, m_ = 1, 32768, 32768
    chunk = emd._pick_row_chunk(b_, n_, m_)
    nc = -(-n_ // chunk)
    over = max(0, 4 * b_ * chunk * m_ - (budget + 4 * b_ * 8 * m_))
    _check("emd route: streaming buffer within byte budget",
           float(over), 0.0, extra=f"(chunk={chunk}, {4*b_*chunk*m_>>20} MiB)")
    if budget // (4 * b_ * m_) >= -(-n_ // 64):
        _check("emd route: chunk count bounded (budget admits <= 64)",
               float(nc), 64.0, extra=f"(chunk={chunk}, nc={nc})")
    # (2) compiled streaming numerics at a cheap non-divisible N (the
    # chunk does not divide 253 -> zero-capacity row padding engages).
    b, n, m = 2, 253, 192
    rng = np.random.RandomState(7)
    x1 = rng.rand(b, n, 3).astype(np.float32)
    x2 = rng.rand(b, m, 3).astype(np.float32)
    rmatch = oracles.approx_match_np(x1, x2)
    rcost = oracles.match_cost_np(x1, x2, rmatch)
    rg1, rg2 = oracles.match_cost_grad_np(x1, x2, rmatch)
    scale = max(float(np.abs(rg1).max()), float(np.abs(rg2).max()))
    cost, g1, g2 = jax.device_get(jax.jit(
        lambda a, c: emd._emd_forward_any(a, c, "chunked"))(x1, x2))
    _check(f"emd[chunked] padded-N cost (B={b}, N={n}, M={m})",
           _maxerr(cost, rcost) / max(float(rcost.max()), 1.0), 2e-3,
           extra="(relative)")
    _check("emd[chunked] padded-N grads",
           max(_maxerr(g1, rg1), _maxerr(g2, rg2)) / scale, 5e-3,
           extra="(relative to grad max)")


def check_chamfer_large_n(b=1, n=16384, m=16384, seed=5):
    """Chamfer at the same large-N regime as check_emd_large_n. Unlike EMD
    (whose kernel envelope needed round-4's streaming fallback), the
    Chamfer kernel grids over BOTH point axes with O(TN*TM) VMEM, so
    16384^2 was always inside its design -- this pins that claim on
    hardware, forward (running min/argmin across 32x the headline tile
    count) and the one-hot MXU backward. The dense-XLA impl is skipped: it
    materializes (B,N,M) by design and is not the large-N path."""
    check_chamfer(b=b, n=n, m=m, seed=seed, impls=("pallas",),
                  tag=f" large-N (B={b}, N={n}, M={m})")


def check_sp_shard_map(b=2, n=256, m=192, seed=6):
    """Compiled Pallas under jax.shard_map (the --point_parallel path).

    The CPU suite runs the SP losses with impl="xla" (Pallas interpret
    mode cannot trace under shard_map's vma checker — the HLO interpreter
    inlines the kernel jaxpr), so the compiled-kernel-under-shard_map
    contract is ONLY checkable on hardware. This is the check that would
    have caught the round-4 vma regression: pallas_call's out
    ShapeDtypeStructs must inherit the inputs' varying-manual-axes type
    (ops/chamfer.py:_out_vma) or shard_map tracing fails. A 1-device mesh
    exercises the full trace/compile contract; cross-device numerics are
    pinned on the 8-virtual-device CPU suite."""
    from jax.sharding import Mesh

    from pointnet_autoencoder_tpu.parallel import sp

    rng = np.random.RandomState(seed)
    x1 = rng.randn(b, n, 3).astype(np.float32)
    x2 = rng.randn(b, m, 3).astype(np.float32)
    rd1, _, rd2, _ = oracles.nn_distance_np(x1, x2)
    rloss = float(rd1.mean() + rd2.mean())
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    def loss(a, c):
        return sp.chamfer_loss_point_sharded(a, c, mesh)

    v = float(jax.jit(loss)(x1, x2))
    _check("sp[shard_map] chamfer loss", abs(v - rloss), 1e-5)
    g1, g2 = jax.device_get(jax.jit(jax.grad(loss, argnums=(0, 1)))(x1, x2))
    # Oracle gradient of mean(d1)+mean(d2) via the analytic VJP oracle.
    _, ri1, _, ri2 = oracles.nn_distance_np(x1, x2)
    og1 = np.full((b, n), 1.0 / (b * n), np.float32)
    og2 = np.full((b, m), 1.0 / (b * m), np.float32)
    rg1, rg2 = oracles.nn_distance_grad_np(x1, x2, ri1, ri2, og1, og2)
    _check("sp[shard_map] chamfer grad",
           max(_maxerr(g1, rg1), _maxerr(g2, rg2)), 5e-5)


# Strategic first draws for fuzz(): Pallas tile boundaries +-1, B=1,
# single-point clouds, extreme N:M (module-level so the test suite can
# substitute small shapes when smoking the harness on the CPU backend).
_FUZZ_POOL = [(1, 511, 513), (2, 512, 512), (3, 1023, 65), (1, 64, 2048),
              (2, 2048, 64), (4, 129, 127), (1, 1, 1), (2, 513, 511)]


def fuzz(draws: int = 8, seed0: int = 100) -> None:
    """Shape-fuzz the loss kernels on the attached accelerator.

    The CPU suite fuzzes shapes in interpret mode, but Mosaic layout and
    precision behavior only exists in *compiled* kernels (CLAUDE.md lists
    two whole bug classes — i1-mask relayouts, single-pass bf16 matmuls —
    that interpret mode cannot exhibit). The first draws are strategic:
    tile-boundary +-1 (the Pallas Chamfer pads to 512), B=1, single-point
    clouds, and extreme N:M ratios (the capacity-factor paths); the rest
    are random. Each draw compiles fresh programs, so runtime is
    compile-bound — pass --compilation_cache_dir to make repeats cheap."""
    rng = np.random.RandomState(seed0)
    pool = _FUZZ_POOL
    for t in range(draws):
        if t < len(pool):
            b, n, m = pool[t]
        else:
            b = int(rng.randint(1, 5))
            n = int(rng.randint(1, 1500))
            m = int(rng.randint(1, 1500))
        print(f"-- fuzz draw {t}: chamfer b={b} n={n} m={m}")
        check_chamfer(b=b, n=n, m=m, seed=1000 + t)
        # EMD's annealing scan is compile-heavy; cap the cloud sizes.
        be, ne, me = min(b, 2), min(n, 512), min(m, 512)
        print(f"-- fuzz draw {t}: emd b={be} n={ne} m={me}")
        check_emd(b=be, n=ne, m=me, seed=2000 + t)


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fuzz", type=int, default=0, metavar="K",
                   help="after the fixed contracts, fuzz K extra shape "
                        "draws (tile boundaries, B=1, extreme N:M, then "
                        "random) through chamfer and emd on the hardware")
    p.add_argument("--large_n", action="store_true",
                   help="also check the large-N (N=M=16384) regime: the "
                        "Chamfer kernel (fwd+bwd), the fused EMD kernel's "
                        "recompute branch, and the streaming XLA EMD path "
                        "vs the numpy oracles (slow: the EMD host oracle "
                        "takes minutes at 268M pairs)")
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persistent XLA compile cache (fuzz repeats are "
                        "compile-bound without it)")
    args = p.parse_args(argv)
    if args.compilation_cache_dir:
        from pointnet_autoencoder_tpu.utils.backend import (
            enable_compilation_cache,
        )

        enable_compilation_cache(args.compilation_cache_dir)
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    check_chamfer()
    check_emd()
    check_fused_head()
    check_fused_encoder()
    check_sp_shard_map()
    check_emd_route_boundary()
    if args.large_n:
        check_chamfer_large_n()
        check_emd_large_n()
        check_emd_large_prime_n()
    if args.fuzz:
        fuzz(args.fuzz)
    if _FAILURES:
        print(f"{len(_FAILURES)} FAILURES: {_FAILURES}")
        return 1
    print("all hardware parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
