"""CLI argument-surface tests (no backend initialization needed)."""

from pointnet_autoencoder_tpu.cli import test as test_cli
from pointnet_autoencoder_tpu.cli import train as train_cli
from pointnet_autoencoder_tpu.config import TrainConfig


def test_train_defaults_match_reference():
    args = train_cli.build_parser().parse_args([])
    # Reference defaults (train.py:20-34).
    assert args.model == "model"
    assert args.num_point == 2048
    assert args.max_epoch == 201
    assert args.batch_size == 32
    assert args.learning_rate == 0.001
    assert args.momentum == 0.9
    assert args.optimizer == "adam"
    assert args.decay_step == 200000
    assert args.decay_rate == 0.7
    assert args.log_dir == "log"
    assert args.category is None
    assert args.no_rotation is False
    assert args.gpu == 0


def test_train_reference_invocation_parses():
    # The README.md:27 command line of the reference.
    args = train_cli.build_parser().parse_args(
        ["--model", "model", "--category", "Chair", "--no_rotation"]
    )
    cfg = train_cli.config_from_args(args)
    assert isinstance(cfg, TrainConfig)
    assert cfg.category == "Chair" and cfg.no_rotation


def test_train_new_flags():
    args = train_cli.build_parser().parse_args(
        ["--input_mode", "host", "--resume", "--no-bf16",
         "--data_parallel", "4", "--lr_floor", "1e-5"]
    )
    cfg = train_cli.config_from_args(args)
    assert cfg.input_mode == "host" and cfg.resume and not cfg.bf16
    assert cfg.data_parallel == 4 and cfg.lr_floor == 1e-5
    assert TrainConfig().bf16  # bf16 is the default


def test_compilation_cache_flag_parses():
    args = train_cli.build_parser().parse_args(
        ["--compilation_cache_dir", "/tmp/xc"]
    )
    cfg = train_cli.config_from_args(args)
    assert cfg.compilation_cache_dir == "/tmp/xc"
    assert TrainConfig().compilation_cache_dir is None  # opt-in
    args = test_cli.build_parser().parse_args(
        ["--compilation_cache_dir", "/tmp/xc"]
    )
    assert args.compilation_cache_dir == "/tmp/xc"


def test_serve_cli_flags_parse():
    from pointnet_autoencoder_tpu.cli import serve as serve_cli

    args = serve_cli.build_parser().parse_args(
        ["--model_path", "/tmp/b", "--max_pending_shapes", "16",
         "--max_delay_ms", "5", "--compilation_cache_dir", "/tmp/xc"]
    )
    assert args.max_pending_shapes == 16 and args.max_delay_ms == 5.0
    assert args.compilation_cache_dir == "/tmp/xc"
    assert serve_cli.build_parser().parse_args(
        ["--model_path", "/tmp/b"]).max_pending_shapes is None


def test_test_cli_defaults_match_reference():
    args = test_cli.build_parser().parse_args([])
    assert args.model == "model"
    assert args.model_path == "log/model.ckpt"
    assert args.num_point == 2048
    assert args.num_group == 1
    assert args.category is None


def test_config_json_roundtrip():
    cfg = TrainConfig(model="model_emd", category="Chair", batch_size=8)
    cfg2 = TrainConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_parity_harness_on_fixture(tmp_path):
    """The real-data parity harness (cli/parity.py) must run end-to-end on
    the synthetic fixture and append a row to the results file; the day the
    real archive exists the same command produces a REAL row."""
    from pointnet_autoencoder_tpu.cli import parity

    results = tmp_path / "RESULTS.md"
    record = parity.run([
        "--data_path", str(tmp_path / "fix"), "--synth_fixture",
        "--num_point", "64", "--batch_size", "8", "--max_epoch", "1",
        "--log_dir", str(tmp_path / "log"),
        "--results", str(results), "--seed", "0",
    ])
    assert "fixture" in record["data"]
    assert record["train_steps"] > 0
    assert record["best_eval_chamfer"] > 0
    # Compile-inclusive wall and steady-state throughput are separate
    # columns (a smoke run's wall is compile-dominated; the row must say
    # so rather than imply 2-shapes/s training).
    assert record["wall_seconds_incl_compile"] > 0
    assert "post_warmup_shapes_per_sec" in record
    text = results.read_text()
    assert "Real-data parity runs" in text
    assert "| fixture |" in text
    # Appending a second row must not duplicate the section header.
    parity.run([
        "--data_path", str(tmp_path / "fix"), "--synth_fixture",
        "--num_point", "64", "--batch_size", "8", "--max_epoch", "1",
        "--log_dir", str(tmp_path / "log2"),
        "--results", str(results), "--seed", "1",
    ])
    assert results.read_text().count("Real-data parity runs") == 1


def test_parity_append_survives_old_format_results(tmp_path):
    """A results file written by an older parity version (7-column table)
    must not crash the append or lose the row -- it can summarize a
    multi-hour run. A fresh current-format table is started instead."""
    from pointnet_autoencoder_tpu.cli import parity

    path = tmp_path / "RESULTS.md"
    path.write_text(
        "## Real-data parity runs\n\n"
        "| date | data | command | best eval Chamfer | throughput "
        "| wall | backend |\n"
        "|---|---|---|---|---|---|---|\n"
        "| 2026-01-01 | fixture | `old` | 0.1 | 2 shapes/s | 80s | tpu |\n"
    )
    record = {
        "date": "2026-08-17", "command": "parity --model model",
        "data": "stand-in fixture (NOT the real archive)",
        "best_eval_chamfer": 0.01, "train_steps": 30,
        "wall_seconds_incl_compile": 100.0,
        "post_warmup_shapes_per_sec": None, "backend": "cpu x8",
    }
    parity._append_results(str(path), record, is_real=False)
    text = path.read_text()
    assert "| 2026-08-17 | fixture |" in text  # new row recorded
    assert "| 2026-01-01 | fixture |" in text  # old row untouched
    assert text.count("## Real-data parity runs") == 1


def test_parity_scan_helpers(tmp_path):
    """best-ckpt Chamfer = pcloss at the min-loss eval record of THIS run;
    post-warmup throughput = slope across this run's train records."""
    import json as _json

    from pointnet_autoencoder_tpu.cli import parity

    log = tmp_path / "log"
    log.mkdir()
    rows = [
        # A stale record from a previous run in the same log dir (t=5).
        {"split": "test", "step": 1, "time": 5.0, "loss": 0.1,
         "pcloss": 0.001},
        # This run (since=10): best LOSS at step 30 (pcloss 0.04), while
        # the min pcloss (0.03) happens at a worse-loss epoch.
        {"split": "test", "step": 20, "time": 20.0, "loss": 5.0,
         "pcloss": 0.03},
        {"split": "test", "step": 30, "time": 30.0, "loss": 4.0,
         "pcloss": 0.04},
        # Train records: 20 steps over 10 seconds after the first record.
        {"split": "train", "step": 10, "time": 15.0, "loss": 9.0},
        {"split": "train", "step": 20, "time": 20.0, "loss": 8.0},
        {"split": "train", "step": 30, "time": 25.0, "loss": 7.0},
    ]
    with open(log / "scalars.jsonl", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    assert parity._eval_pcloss_at_best_loss(str(log), since=10.0) == 0.04
    # Stale run included when unscoped -> its tiny loss would win.
    assert parity._eval_pcloss_at_best_loss(str(log), since=0.0) == 0.001
    # (30-10) steps * batch 16 / (25-15)s = 32 shapes/s.
    assert parity._post_warmup_throughput(str(log), 16, since=10.0) == 32.0
    # Fewer than two train records -> None.
    assert parity._post_warmup_throughput(str(log), 16, since=24.0) is None
    assert parity._eval_pcloss_at_best_loss(str(tmp_path / "none")) is None

    # A single-epoch device-input run writes ALL its train records in one
    # burst at the epoch end (timestamps milliseconds apart); the slope
    # over that burst is meaningless and must be refused, not recorded as
    # millions of shapes/s.
    burst = tmp_path / "burst"
    burst.mkdir()
    with open(burst / "scalars.jsonl", "w") as f:
        for i, t in ((10, 100.000), (20, 100.004), (30, 100.009)):
            f.write(_json.dumps(
                {"split": "train", "step": i, "time": t, "loss": 1.0}) + "\n")
    assert parity._post_warmup_throughput(str(burst), 16) is None


def test_fixture_variable_points(tmp_path):
    from pointnet_autoencoder_tpu.data import synthetic
    from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset

    root = synthetic.write_fixture(str(tmp_path / "v"),
                                   shapes_per_category=6,
                                   points_per_shape=64, seed=0,
                                   variable_points=True)
    ds = PartDataset(root, npoints=32, split="trainval")
    raw_lengths = {len(ds._load(i)[1]) for i in range(len(ds))}
    assert len(raw_lengths) > 1, "expected ragged per-shape point counts"
    assert min(raw_lengths) >= 32 and max(raw_lengths) <= 64
