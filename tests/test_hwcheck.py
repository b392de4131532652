"""Pin the on-hardware verification harness itself (ops/hwcheck.py).

The harness is normally driven against the attached accelerator; this
smoke runs its checks and one fuzz draw on the CPU test backend so import
rot, oracle-signature drift, or a broken --fuzz loop is caught by CI
instead of at verification time.
"""

import pointnet_autoencoder_tpu.ops.hwcheck as hw


def _run_clean(fn, *args, **kwargs):
    before = len(hw._FAILURES)
    fn(*args, **kwargs)
    assert hw._FAILURES[before:] == [], hw._FAILURES[before:]


def test_hwcheck_contracts_pass_on_test_backend():
    _run_clean(hw.check_chamfer, b=1, n=33, m=17)
    _run_clean(hw.check_emd, b=1, n=24, m=16)
    _run_clean(hw.check_fused_head, b=1, n=16, c=8, f=32)
    _run_clean(hw.check_fused_encoder, b=1, n=16)


def test_hwcheck_chamfer_large_n_scaled_down():
    # The real run is N=M=16384 on the accelerator; here the same code
    # path (pallas-only, tagged names) at a CPU-sized shape.
    _run_clean(hw.check_chamfer_large_n, b=1, n=40, m=28)


def test_hwcheck_fuzz_one_draw(monkeypatch):
    # Small shapes: the real pool's tile-boundary clouds are sized for
    # the accelerator; interpret mode on CPU wants something quicker.
    monkeypatch.setattr(hw, "_FUZZ_POOL", [(1, 33, 17)])
    _run_clean(hw.fuzz, draws=1)


def test_hwcheck_main_cli(capsys):
    rc = hw.main([])
    out = capsys.readouterr().out
    assert rc == 0
    assert "all hardware parity checks passed" in out
