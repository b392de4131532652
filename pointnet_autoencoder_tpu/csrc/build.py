"""Builds the native components (ctypes shared libraries).

Usage: ``python -m pointnet_autoencoder_tpu.csrc.build``

Produces, next to this file:
  - libpcae_fastio.so   -- fast .pts/.seg text parser (data loader hot path)
  - libpcae_render.so   -- z-buffer ball-splat renderer (visualization)

Equivalent role to the reference's compile scripts
(tf_ops/*/tf_*_compile.sh, compile_render_balls_so.sh), except the loss
ops need no native build here: they are Pallas TPU kernels.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "libpcae_fastio.so": ["fastio.cpp"],
    "libpcae_render.so": ["render_balls.cpp"],
}


def build(verbose: bool = True) -> bool:
    ok = True
    for lib, sources in TARGETS.items():
        srcs = [os.path.join(HERE, s) for s in sources]
        missing = [s for s in srcs if not os.path.exists(s)]
        if missing:
            # Building nothing is a failure, not a silent success.
            print(f"[csrc] cannot build {lib}: missing source "
                  f"{', '.join(missing)}", file=sys.stderr)
            ok = False
            continue
        out = os.path.join(HERE, lib)
        if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
        ):
            if verbose:
                print(f"[csrc] {lib} up to date")
            continue
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, *srcs]
        if verbose:
            print("[csrc]", " ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            detail = ""
            stderr = getattr(e, "stderr", None)
            if stderr:  # captured when not verbose: surface the compiler text
                detail = "\n" + (stderr.decode(errors="replace")
                                 if isinstance(stderr, bytes) else str(stderr))
            print(f"[csrc] build of {lib} failed: {e}{detail}",
                  file=sys.stderr)
            ok = False
    return ok


def ensure_built() -> bool:
    """Best-effort build; callers fall back to pure-python paths on failure."""
    try:
        return build(verbose=False)
    except Exception:
        return False


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
