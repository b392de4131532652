"""Training/eval configuration.

One dataclass behind the CLI; field names and defaults mirror the reference
flags (train.py:20-34, test.py:19-26) so invocations are drop-in
compatible. Fields marked [new] are TPU-build additions (resume, profiling,
mixed precision, data-parallel degree) that default to reference behavior.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    model: str = "model"
    category: Optional[str] = None
    log_dir: str = "log"
    num_point: int = 2048
    max_epoch: int = 201
    batch_size: int = 32
    learning_rate: float = 0.001
    momentum: float = 0.9
    optimizer: str = "adam"
    decay_step: int = 200000
    decay_rate: float = 0.7
    no_rotation: bool = False
    data_path: str = "data/shapenetcore_partanno_segmentation_benchmark_v0"

    # [new] TPU-build extensions
    input_mode: str = "device"    # "device": dataset resident in HBM,
                                  # resample+rotate on-device (fast path);
                                  # "host": reference-style host assembly
    resume: bool = False          # continue from log_dir/model.ckpt
    seed: int = 0                 # host-side data/init seed
    data_parallel: Optional[int] = None  # devices on the data axis;
                                         # None = all remaining
    model_parallel: int = 1       # tensor-parallel degree over the decoder
                                  # FC stacks (parallel/tp.py); 1 = off
    point_parallel: bool = False  # shard the batch's POINT axis over the
                                  # mesh's data axis (parallel/sp.py): the
                                  # long-N training mode -- encoder sharded
                                  # by GSPMD, losses via the shard_map SP
                                  # decompositions. num_point must divide
                                  # by the axis size; exclusive with
                                  # model_parallel > 1
    bf16: bool = True             # bfloat16 matmuls in the network (36%
                                  # faster; converges identically to f32 --
                                  # see docs/ARCHITECTURE.md; --no-bf16
                                  # restores f32 everywhere)
    bf16_params: bool = False     # store matmul MASTER weights in bf16 and
                                  # apply f32 Adam updates with stochastic
                                  # rounding (train/master.py); halves
                                  # parameter HBM traffic. Opt-in; measured
                                  # numbers in docs/ARCHITECTURE.md
    bf16_moments: bool = False    # store Adam moment slots for matmul
                                  # params in bf16 with stochastically
                                  # rounded updates (train/master.py:
                                  # bf16_moments); halves optimizer-state
                                  # HBM traffic. Opt-in; measured numbers
                                  # in docs/ARCHITECTURE.md
    profile_dir: Optional[str] = None    # jax.profiler trace output
    lr_floor: Optional[float] = None     # reference's intended-but-dead clamp
    eval_only: bool = False
    log_every: int = 10           # batches between running-mean log lines
    cache_dir: Optional[str] = None  # on-disk decoded-shape cache (npz);
                                     # speeds up process start on real data
    compilation_cache_dir: Optional[str] = None
    # persistent XLA compilation cache: a restarted run reloads its
    # compiled programs instead of recompiling (utils/backend.py:
    # enable_compilation_cache; measured numbers in docs/ARCHITECTURE.md)
    async_checkpoints: bool = True
    # checkpoint saves run on a background thread from an on-device state
    # snapshot (train/checkpoint.py:AsyncSaver) so the device→host
    # transfer overlaps training; content/naming/policy identical to the
    # synchronous path. --sync_checkpoints restores blocking saves.

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "TrainConfig":
        return cls(**json.loads(text))


@dataclasses.dataclass
class TestConfig:
    model: str = "model"
    model_path: str = "log/model.ckpt"
    category: Optional[str] = None
    num_point: int = 2048
    num_group: int = 1
    data_path: str = "data/shapenetcore_partanno_segmentation_benchmark_v0"
    out_dir: Optional[str] = None   # write rendered PNGs here (headless)
    interactive: bool = False       # opencv viewer when a display exists
    num_shapes: Optional[int] = None
    seed: int = 0
