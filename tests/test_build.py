"""Tests for the native build driver (csrc/build.py).

The reference ships bash compile scripts with no checks at all
(tf_ops/*/tf_*_compile.sh); ours must report failures honestly because
the CLIs invoke it best-effort and fall back to pure-python paths.
"""

import os

from pointnet_autoencoder_tpu.csrc import build as build_mod


def test_build_success_and_up_to_date(tmp_path, monkeypatch, capsys):
    src = tmp_path / "ok.cpp"
    src.write_text('extern "C" int forty_two() { return 42; }\n')
    monkeypatch.setattr(build_mod, "HERE", str(tmp_path))
    monkeypatch.setattr(build_mod, "TARGETS", {"libok.so": ["ok.cpp"]})

    assert build_mod.build(verbose=False) is True
    assert os.path.exists(tmp_path / "libok.so")

    # Second run must skip the compile (mtime check), still succeed.
    assert build_mod.build(verbose=True) is True
    assert "up to date" in capsys.readouterr().out


def test_build_missing_source_is_failure(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(build_mod, "HERE", str(tmp_path))
    monkeypatch.setattr(build_mod, "TARGETS", {"libgone.so": ["gone.cpp"]})

    assert build_mod.build(verbose=False) is False
    assert "missing source" in capsys.readouterr().err


def test_build_compiler_error_surfaces_stderr(tmp_path, monkeypatch, capsys):
    src = tmp_path / "bad.cpp"
    src.write_text("this is not C++\n")
    monkeypatch.setattr(build_mod, "HERE", str(tmp_path))
    monkeypatch.setattr(build_mod, "TARGETS", {"libbad.so": ["bad.cpp"]})

    assert build_mod.build(verbose=False) is False
    err = capsys.readouterr().err
    assert "failed" in err
    # The captured compiler diagnostics must be surfaced, not swallowed.
    assert "error" in err


def test_ensure_built_never_raises(monkeypatch):
    def boom(verbose):
        raise OSError("toolchain exploded")

    monkeypatch.setattr(build_mod, "build", boom)
    assert build_mod.ensure_built() is False
