"""Training CLI: flag-for-flag surface of the reference's train.py.

    python -m pointnet_autoencoder_tpu.cli.train \
        --model model --category Chair --no_rotation

Reference flags preserved (train.py:20-34); --gpu is accepted for
reference-CLI compatibility but has no effect -- device selection on TPU
is the runtime's job and the mesh spans all visible devices (use
--data_parallel to bound it). TPU-build additions: --data_path, --resume,
--seed, --data_parallel, --bf16, --bf16_params, --profile_dir, --lr_floor.
"""

from __future__ import annotations

import argparse
import os
import sys

from pointnet_autoencoder_tpu.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    d = TrainConfig()
    p.add_argument("--gpu", type=int, default=0,
                   help="Accepted for reference compatibility; ignored "
                        "(the TPU runtime owns device selection)")
    p.add_argument("--model", default=d.model,
                   help="Model name [default: model]")
    p.add_argument("--category", default=None,
                   help="Which single class to train on [default: None]")
    p.add_argument("--log_dir", default=d.log_dir,
                   help="Log dir [default: log]")
    p.add_argument("--num_point", type=int, default=d.num_point,
                   help="Point Number [default: 2048]")
    p.add_argument("--max_epoch", type=int, default=d.max_epoch,
                   help="Epoch to run [default: 201]")
    p.add_argument("--batch_size", type=int, default=d.batch_size,
                   help="Batch Size during training [default: 32]")
    p.add_argument("--learning_rate", type=float, default=d.learning_rate,
                   help="Initial learning rate [default: 0.001]")
    p.add_argument("--momentum", type=float, default=d.momentum,
                   help="Momentum for the momentum optimizer [default: 0.9]")
    p.add_argument("--optimizer", default=d.optimizer,
                   help="adam or momentum [default: adam]")
    p.add_argument("--decay_step", type=int, default=d.decay_step,
                   help="Decay step for lr decay [default: 200000]")
    p.add_argument("--decay_rate", type=float, default=d.decay_rate,
                   help="Decay rate for lr decay [default: 0.7]")
    p.add_argument("--no_rotation", action="store_true",
                   help="Disable random rotation during training.")
    # TPU-build additions
    p.add_argument("--data_path", default=d.data_path,
                   help="ShapeNetPart root directory")
    p.add_argument("--input_mode", default=d.input_mode,
                   choices=["device", "host"],
                   help="'device': HBM-resident dataset with on-device "
                        "resample/rotation (fast); 'host': reference-style "
                        "host batch assembly [default: device]")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in log_dir")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--data_parallel", type=int, default=None,
                   help="Number of devices on the data axis "
                        "[default: all remaining]")
    p.add_argument("--model_parallel", type=int, default=d.model_parallel,
                   help="Tensor-parallel degree over the decoder FC stacks "
                        "[default: 1 = off]; mesh is data x model")
    p.add_argument("--point_parallel", action="store_true",
                   default=d.point_parallel,
                   help="Shard the batch's POINT axis over the data axis "
                        "(parallel/sp.py): the long-N training mode -- "
                        "encoder sharded by GSPMD, losses via shard_map "
                        "SP decompositions. num_point must divide by the "
                        "axis size; exclusive with --model_parallel")
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=d.bf16,
                   help="bfloat16 matmuls in the network (default on; "
                        "--no-bf16 restores f32; losses/BN always f32)")
    p.add_argument("--bf16_params", action="store_true",
                   default=d.bf16_params,
                   help="Store matmul MASTER weights in bf16; f32 Adam "
                        "updates applied with stochastic rounding "
                        "(halves parameter HBM traffic; BN/optimizer "
                        "state stay f32; see docs/ARCHITECTURE.md)")
    p.add_argument("--bf16_moments", action="store_true",
                   default=d.bf16_moments,
                   help="Store Adam moment slots for matmul params in "
                        "bf16 (stochastically rounded f32 updates); "
                        "halves optimizer-state HBM traffic")
    p.add_argument("--profile_dir", default=None,
                   help="Write a jax.profiler trace of the first epoch here")
    p.add_argument("--lr_floor", type=float, default=None,
                   help="Optional LR clamp (the reference intended 1e-5 but "
                        "the clip is dead code; default preserves published "
                        "behavior: no floor)")
    p.add_argument("--cache_dir", default=None,
                   help="On-disk cache of decoded shapes (.npz). A warm "
                        "cache skips .pts/.seg text decoding at process "
                        "start (~2.4x over native fastio, far more over "
                        "the numpy fallback)")
    p.add_argument("--compilation_cache_dir", default=None,
                   help="Persistent XLA compilation cache directory: a "
                        "restarted run (resume, schedule sweep, crash "
                        "recovery) reloads its compiled train/eval "
                        "programs instead of paying the ~minutes-long "
                        "first compile again")
    p.add_argument("--log_every", type=int, default=d.log_every)
    p.add_argument("--eval_only", action="store_true",
                   help="Run a single evaluation pass (use with --resume)")
    p.add_argument("--sync_checkpoints", action="store_true",
                   help="Block training while each checkpoint saves "
                        "(default: saves run on a background thread from "
                        "an on-device state snapshot; identical files, "
                        "~4.7 s/save off the epoch loop on tunneled "
                        "backends)")
    return p


def config_from_args(args) -> TrainConfig:
    return TrainConfig(
        model=args.model, category=args.category, log_dir=args.log_dir,
        num_point=args.num_point, max_epoch=args.max_epoch,
        batch_size=args.batch_size, learning_rate=args.learning_rate,
        momentum=args.momentum, optimizer=args.optimizer,
        decay_step=args.decay_step, decay_rate=args.decay_rate,
        no_rotation=args.no_rotation, data_path=args.data_path,
        input_mode=args.input_mode, resume=args.resume, seed=args.seed,
        data_parallel=args.data_parallel,
        model_parallel=args.model_parallel,
        point_parallel=args.point_parallel, bf16=args.bf16,
        bf16_params=args.bf16_params, bf16_moments=args.bf16_moments,
        profile_dir=args.profile_dir, lr_floor=args.lr_floor,
        log_every=args.log_every, eval_only=args.eval_only,
        cache_dir=args.cache_dir,
        compilation_cache_dir=args.compilation_cache_dir,
        async_checkpoints=not args.sync_checkpoints,
    )


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    # Import jax lazily so --help works without initializing a backend.
    from pointnet_autoencoder_tpu.utils.backend import (
        enable_compilation_cache,
        honor_cpu_env_request,
    )

    honor_cpu_env_request()  # JAX_PLATFORMS=cpu wins over hardware plugins
    if config.compilation_cache_dir:
        enable_compilation_cache(config.compilation_cache_dir)
    from pointnet_autoencoder_tpu.csrc.build import ensure_built
    from pointnet_autoencoder_tpu.train.logging import Logger
    from pointnet_autoencoder_tpu.train.loop import Trainer

    from pointnet_autoencoder_tpu.parallel.mesh import (
        initialize_distributed_if_requested,
    )

    ensure_built()  # native fastio, best-effort
    initialize_distributed_if_requested()
    logger = Logger(config.log_dir)
    logger.log(f"pid: {os.getpid()}")
    logger.log(config.to_json())
    trainer = Trainer(config, logger=logger)
    best = trainer.train()
    trainer.close()  # release saver/checkpointer (train() only flushes)
    logger.log(f"done; best eval loss {best:.6f}")
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
