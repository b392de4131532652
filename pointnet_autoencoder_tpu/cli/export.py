"""Export a params-only serving bundle from a training checkpoint.

    python -m pointnet_autoencoder_tpu.cli.export \
        --model model --model_path log/best_model_epoch_087.ckpt \
        --num_point 2048 --out serving/chair_fc

The bundle (inference variables + metadata, no optimizer state) is ~3x
smaller than a training checkpoint and loads via
``InferenceSession.from_bundle(out_dir)`` without any knowledge of the
training optimizer. The reference has no serving-export path (its test.py
restores the full Saver state, test.py:51).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="model",
                   help="Registry name the checkpoint was trained with")
    p.add_argument("--model_path", required=True,
                   help="Training checkpoint directory (model.ckpt / "
                        "best_model_epoch_NNN.ckpt)")
    p.add_argument("--num_point", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=32,
                   help="Compiled batch size for the restore-side forward")
    p.add_argument("--out", required=True,
                   help="Bundle output directory (or .npz path with "
                        "--format reference_npz)")
    p.add_argument("--format", default="bundle",
                   choices=("bundle", "reference_npz"),
                   help="bundle: orbax serving bundle (default). "
                        "reference_npz: a flat numpy archive keyed by the "
                        "REFERENCE stack's variable names (conv2d/deconv "
                        "kernel layouts restored) -- portable to any "
                        "framework, re-importable via cli.import_tf, and "
                        "Saver-writable for the reference's test.py")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    from pointnet_autoencoder_tpu.inference import InferenceSession

    sess = InferenceSession(args.model, args.model_path, args.num_point,
                            batch_size=args.batch_size)
    if args.format == "reference_npz":
        import jax
        import numpy as np

        from pointnet_autoencoder_tpu.tf_import import export_reference_arrays

        arrays = export_reference_arrays(jax.device_get(sess.variables))
        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        np.savez(out, **arrays)
        print(f"reference-named weights ({len(arrays)} arrays) written "
              f"to {out}")
        return out
    out = sess.export_bundle(args.out)
    print(f"serving bundle written to {out}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
