"""Real-data parity harness: one command from dataset to recorded numbers.

Pointed at a ``shapenetcore_partanno_segmentation_benchmark_v0`` directory,
this:

1. verifies the dataset against the real archive's known split sizes
   (Chair trainval = 3371 / test = 704; the full run's scale knobs), or
   reports that it is running on a stand-in fixture when the counts differ;
2. runs the reference README's headline command
   (``train.py --model model --num_point 2048 --category Chair
   --no_rotation``, README.md:27) at the requested epoch count;
3. appends the measured best eval Chamfer and training throughput to
   docs/RESULTS.md so the reference-matching claim is checkable the day
   real data is available.

Runs end-to-end on the synthetic fixture today (pass ``--synth_fixture`` to
have one generated on the fly); needs zero edits for the real archive.

    python -m pointnet_autoencoder_tpu.cli.parity --data_path <root> \
        [--max_epoch N] [--results docs/RESULTS.md]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

# Real-archive invariants (train_test_split/*.json of the 635 MB archive,
# reference README.md:18; counts quoted in SURVEY.md).
REAL_CHAIR_TRAINVAL = 3371
REAL_CHAIR_TEST = 704


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path",
                   default="data/shapenetcore_partanno_segmentation_benchmark_v0")
    p.add_argument("--synth_fixture", action="store_true",
                   help="Generate a synthetic fixture at --data_path first "
                        "(for environments without the real archive)")
    p.add_argument("--category", default="Chair")
    p.add_argument("--model", default="model")
    p.add_argument("--num_point", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_epoch", type=int, default=201,
                   help="Reference README trains 201 epochs; lower for a "
                        "smoke run")
    p.add_argument("--log_dir", default="log_parity")
    p.add_argument("--results", default=None,
                   help="RESULTS.md to append to [default: docs/RESULTS.md "
                        "next to the package]")
    p.add_argument("--seed", type=int, default=0)
    return p


def check_splits(data_path: str, category: str):
    """Returns (is_real_archive, counts dict). Counts come from the actual
    loader (split json intersected with on-disk shapes), the same view
    training sees."""
    from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset

    counts = {
        split: len(PartDataset(data_path, npoints=8, split=split,
                               class_choice=[category]))
        for split in ("trainval", "test")
    }
    is_real = (category == "Chair"
               and counts["trainval"] == REAL_CHAIR_TRAINVAL
               and counts["test"] == REAL_CHAIR_TEST)
    return is_real, counts


def run(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    if args.synth_fixture and not os.path.exists(
            os.path.join(args.data_path, "synsetoffset2category.txt")):
        from pointnet_autoencoder_tpu.data import synthetic

        # Variable per-shape point counts exercise the DeviceDataset
        # cyclic-padding path the way the real (ragged) archive does.
        synthetic.write_fixture(args.data_path, shapes_per_category=48,
                                points_per_shape=900, seed=args.seed,
                                variable_points=True)

    is_real, counts = check_splits(args.data_path, args.category)
    data_kind = ("real shapenetcore_partanno archive" if is_real
                 else "stand-in fixture (NOT the real archive)")
    print(f"dataset: {data_kind}")
    print(f"  {args.category} trainval={counts['trainval']} "
          f"test={counts['test']}"
          + ("" if is_real else
             f"  (real archive: trainval={REAL_CHAIR_TRAINVAL} "
             f"test={REAL_CHAIR_TEST})"))

    # The README command (reference README.md:27), TrainConfig-shaped.
    from pointnet_autoencoder_tpu.config import TrainConfig
    from pointnet_autoencoder_tpu.train.loop import Trainer

    cfg = TrainConfig(
        model=args.model, category=args.category, log_dir=args.log_dir,
        num_point=args.num_point, max_epoch=args.max_epoch,
        batch_size=args.batch_size, no_rotation=True,
        data_path=args.data_path, seed=args.seed,
    )
    t0 = time.time()
    trainer = Trainer(cfg)
    best_loss = trainer.train()
    wall = time.time() - t0

    # The headline Chamfer comes from the eval 'pcloss' metric (raw mean
    # Chamfer, models/model.py:82), which every loss family reports --
    # dividing the *loss* by 100 would be wrong for model_emd (loss is the
    # EMD cost) and model_hierachy (loss includes the 0.1x center term).
    best_chamfer = _best_eval_pcloss(args.log_dir)
    if best_chamfer is None:
        best_chamfer = float("nan")
    import jax

    steps = int(jax.device_get(trainer.state.step))
    shapes = steps * args.batch_size
    throughput = shapes / wall if wall > 0 else float("nan")

    record = {
        "date": datetime.date.today().isoformat(),
        "data": data_kind,
        "counts": counts,
        "command": (f"parity --model {args.model} --category {args.category} "
                    f"--num_point {args.num_point} --max_epoch "
                    f"{args.max_epoch} (README command, no_rotation)"),
        "best_eval_loss": best_loss,
        "best_eval_chamfer": best_chamfer,
        "train_steps": steps,
        "wall_seconds": round(wall, 1),
        "throughput_shapes_per_sec": round(throughput, 1),
        "backend": _backend_name(),
    }

    results_path = args.results or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "docs", "RESULTS.md")
    _append_results(results_path, record, is_real)
    print(json.dumps(record))
    return record


def _backend_name() -> str:
    import jax

    return f"{jax.default_backend()} x{len(jax.devices())}"


def _best_eval_pcloss(log_dir: str):
    """Min test-split 'pcloss' from the run's scalars.jsonl, or None if
    eval never ran (e.g. test split smaller than one batch)."""
    path = os.path.join(log_dir, "scalars.jsonl")
    best = None
    if os.path.exists(path):
        with open(path) as f:
            for ln in f:
                try:
                    rec = json.loads(ln)
                except ValueError:
                    continue
                if rec.get("split") == "test" and "pcloss" in rec:
                    v = float(rec["pcloss"])
                    best = v if best is None else min(best, v)
    return best


def _append_results(path: str, record: dict, is_real: bool) -> None:
    header = "## Real-data parity runs"
    line = (f"| {record['date']} | {'REAL' if is_real else 'fixture'} "
            f"| `{record['command']}` | {record['best_eval_chamfer']:.4f} "
            f"| {record['throughput_shapes_per_sec']:.0f} shapes/s "
            f"| {record['wall_seconds']:.0f}s | {record['backend']} |\n")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    text = ""
    if os.path.exists(path):
        with open(path) as f:
            text = f.read()
    if header not in text:
        text += (
            f"\n{header}\n\n"
            "Appended by `python -m pointnet_autoencoder_tpu.cli.parity`.\n"
            "'fixture' rows are synthetic stand-ins; a 'REAL' row appears\n"
            "automatically once the 635 MB ShapeNetPart archive is present.\n\n"
            "| date | data | command | best eval Chamfer | throughput "
            "| wall | backend |\n"
            "|---|---|---|---|---|---|---|\n"
        )
    # Insert the row right after the table header inside our section.
    marker = "|---|---|---|---|---|---|---|\n"
    if marker in text:
        at = text.index(marker, text.index(header)) + len(marker)
        text = text[:at] + line + text[at:]
    else:
        text += line
    with open(path, "w") as f:
        f.write(text)
    print(f"recorded in {path}")


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
