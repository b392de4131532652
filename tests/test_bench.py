"""The driver-artifact pipeline itself (bench.py), smoked on the CPU
backend.

Round 4's perf evidence was lost to an artifact-pipeline failure (rc=124,
nothing printed), not a code regression -- so the pipeline is now a tested
surface: bench.main() must print (possibly several) COMPLETE JSON lines,
headline first, with the driver schema on every line, and honor the
wall-clock budget by naming skipped extras rather than dying.
"""

import json
import os

import pytest


def _run_bench(monkeypatch, capsys, budget: str, tmp_path):
    import bench

    monkeypatch.setenv("BENCH_NUM_POINT", "128")
    monkeypatch.setenv("BENCH_ITERS_SCALE", "0.02")
    monkeypatch.setenv("BENCH_BUDGET_S", budget)
    # The committed BENCH_SELF.json is hardware evidence; the CPU smoke
    # must not overwrite it (it did, once).
    monkeypatch.setenv("BENCH_SELF_PATH", str(tmp_path / "BENCH_SELF.json"))
    # Keep the CPU-backend cache entries out of the repo's TPU cache dir.
    monkeypatch.setattr(
        "pointnet_autoencoder_tpu.utils.backend.enable_compilation_cache",
        lambda *a, **k: "/tmp/bench-test-cache")
    bench.main()
    out = capsys.readouterr().out
    lines = [json.loads(x) for x in out.splitlines() if x.startswith("{")]
    assert lines, f"no artifact lines in output: {out!r}"
    return lines


@pytest.mark.filterwarnings("ignore")
def test_bench_artifact_lines(monkeypatch, capsys, tmp_path):
    lines = _run_bench(monkeypatch, capsys, budget="600", tmp_path=tmp_path)
    # The redirected self-artifact landed at the override path.
    assert (tmp_path / "BENCH_SELF.json").exists()
    for d in lines:  # EVERY printed line is a complete parseable artifact
        # The hook sets BENCH_NUM_POINT=128; the label must track the
        # actual workload and the N=2048 baseline ratio must not apply.
        assert d["metric"] == "train_throughput_model_b32_n128"
        assert d["unit"] == "shapes/sec/chip"
        assert d["value"] > 0
        assert d["vs_baseline"] == 0.0
        assert "model_step_ms" in d["extras"]
        assert "model" in d["extras"]["roofline"]
    # headline-first: the first line already carries the flagship number;
    # later lines accumulate extras monotonically.
    assert len(lines) >= 2
    last = lines[-1]["extras"]
    assert "model_emd_step_ms" in last
    assert "bench_wall_s" in last


def test_bench_budget_skips_extras_not_artifact(monkeypatch, capsys,
                                                tmp_path):
    """With a budget that expires immediately after the headline, every
    extra is skipped BY NAME and the artifact still prints."""
    lines = _run_bench(monkeypatch, capsys, budget="0", tmp_path=tmp_path)
    last = lines[-1]["extras"]
    assert "model_emd" in last["skipped"]
    assert "model_step_ms" in last  # the headline always lands
