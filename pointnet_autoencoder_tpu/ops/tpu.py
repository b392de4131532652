"""Shared TPU hardware facts for the Pallas kernels.

v5e has ~128 MB of VMEM per core -- far more than Mosaic's conservative
default per-kernel cap -- and raising the cap is what lets the EMD kernel
keep a full (N, M) distance cache resident and the fused encoder head use
large point tiles (measured in docs/ARCHITECTURE.md). 100 MB leaves
headroom for double-buffered block IO.
"""

VMEM_LIMIT_BYTES = 100 * 1024 * 1024
