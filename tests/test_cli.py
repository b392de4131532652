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
