"""Shared TPU hardware facts for the Pallas kernels.

v5e has ~128 MB of VMEM per core -- far more than Mosaic's conservative
default per-kernel cap -- and raising the cap is what lets the EMD kernel
keep a full (N, M) distance cache resident and the fused encoder head use
large point tiles (measured in docs/ARCHITECTURE.md). 100 MB leaves
headroom for double-buffered block IO.
"""

VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def out_vma(*operands):
    """Union of the operands' varying-manual-axes (vma) type.

    Under ``jax.shard_map`` (jax >= 0.9, which always type-checks
    collectives against vma) a ``pallas_call``'s out ShapeDtypeStructs
    must carry an explicit vma or tracing fails -- the kernel is opaque
    to the variance checker, so outputs inherit the union of the inputs'
    variance. Outside shard_map every aval's vma is frozenset() and the
    annotation is a no-op. Every Pallas op threads this so any of them
    can sit inside a shard_map body (parallel/sp.py routes the per-shard
    Chamfer here today; the rest are future-proofed the same way)."""
    import jax

    vma = frozenset()
    for o in operands:
        vma |= getattr(jax.typeof(o), "vma", frozenset())
    return vma


def matmul_precision(dtype):
    """Matmul precision for operands of ``dtype``.

    The TPU backend's DEFAULT precision runs f32 matmuls as a single
    bf16x1 MXU pass (measured 1.8e-1 max error on a 256x256 f32 dot vs
    8.6e-6 at HIGHEST, same session) -- fine for the bf16 training
    configuration, silently wrong for f32 ("--no-bf16") operands. Every
    network/op matmul threads this helper: HIGHEST (bf16x6 passes,
    f32-class accuracy) when the operands are f32, backend default when
    they are already bf16 (exact on the MXU either way).
    """
    import jax
    import jax.numpy as jnp

    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def compute_on_tpu() -> bool:
    """Whether computations dispatched *now* target a TPU.

    ``jax.default_backend()`` alone is wrong under a
    ``jax.default_device(cpu_device)`` override: jit then places programs
    on the CPU backend even though the process default backend is still
    TPU, and a compiled (non-interpret) pallas_call would fail to lower
    ("Only interpret mode is supported on CPU backend"). Host-side
    initialization work uses exactly that override to avoid paying the
    tunneled TPU a server round trip per tiny init program (bench.py),
    so every Pallas op's interpret/impl default routes through here.
    """
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        platform = dev if isinstance(dev, str) else getattr(
            dev, "platform", None)
        return platform == "tpu"
    return jax.default_backend() == "tpu"
