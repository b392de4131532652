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
    p.add_argument("--out", required=True, help="Bundle output directory")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)
    from pointnet_autoencoder_tpu.inference import InferenceSession

    sess = InferenceSession(args.model, args.model_path, args.num_point,
                            batch_size=args.batch_size)
    out = sess.export_bundle(args.out)
    print(f"serving bundle written to {out}")
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
