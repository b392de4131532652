"""Step-time probe: bf16 Adam moment storage (--bf16_moments) on the
flagship train step (B=32, N=2048), interleaved windows across optimizer
configs so tunnel-contention drift cancels (round-3 methodology).

Produces the numbers in docs/ARCHITECTURE.md's round-5 bf16-moments
rejection ledger. Run from the repo root on a machine with an
accelerator: python tools/probe_bf16_moments.py

Configs:
  f32        : f32 masters, f32 moments (default)
  params     : --bf16_params            (bf16 masters + SR updates)
  moments    : --bf16_moments           (bf16 m/v for matmul class)
  both       : --bf16_params --bf16_moments
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # `python tools/<probe>.py` puts tools/ on
    sys.path.insert(0, _REPO)  # the path, not the repo root

from pointnet_autoencoder_tpu.utils.backend import enable_compilation_cache

enable_compilation_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"),
    min_compile_time_secs=0.5)

import contextlib

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.parallel import mesh as meshlib
from pointnet_autoencoder_tpu.train import master, schedules
from pointnet_autoencoder_tpu.train.loop import make_step_fns
from pointnet_autoencoder_tpu.train.state import TrainState, make_optimizer

B, N = 32, 2048
ITERS = int(os.environ.get("PROBE_ITERS", "150"))
WINDOWS = int(os.environ.get("PROBE_WINDOWS", "4"))

_cpu = jax.local_devices(backend="cpu")[0]
mesh = meshlib.make_mesh()
lr = schedules.learning_rate_schedule(0.001, 0.7, B, 200000)
bn = schedules.bn_momentum_schedule(B, 200000)

batches = [
    jax.device_put(
        np.random.RandomState(i).randn(B, N, 3).astype(np.float32),
        meshlib.batch_sharding(mesh))
    for i in range(2)
]

spec = get_model_spec("model")


def build(cfg):
    tx = make_optimizer("adam", lr)
    with jax.default_device(_cpu):
        model, variables = spec.init_variables(
            jax.random.PRNGKey(0), N, dtype=jnp.bfloat16)
        sr = False
        if cfg in ("params", "both"):
            variables = dict(variables)
            variables["params"] = master.cast_master_bf16(variables["params"])
            tx = master.f32_math(tx)
            sr = True
        if cfg in ("moments", "both"):
            tx = master.bf16_moments(tx)
        host_state = TrainState.create(variables, tx)
    state = meshlib.replicate(mesh, host_state)
    train_step, _ = make_step_fns(model, spec, tx, bn, lr,
                                  stochastic_round=sr)
    step = jax.jit(train_step, donate_argnums=(0,)).lower(
        state, batches[0]).compile()
    return step, state


def mark(m):
    print(m, file=sys.stderr, flush=True)


CFGS = ["f32", "params", "moments", "both"]
runs = {}
for cfg in CFGS:
    mark(f"build+compile {cfg}")
    step, state = build(cfg)
    for i in range(3):
        state, metrics = step(state, batches[i % 2])
    float(metrics["loss"])
    runs[cfg] = [step, state, float("inf")]
    mark(f"{cfg} warm")

for w in range(WINDOWS):
    for cfg in CFGS:
        step, state, best = runs[cfg]
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, metrics = step(state, batches[i % 2])
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        runs[cfg][1] = state
        runs[cfg][2] = min(best, dt)
        mark(f"w{w} {cfg}: {1e3*dt:.3f} ms")

print("config,best_step_ms,shapes_per_sec")
for cfg in CFGS:
    best = runs[cfg][2]
    print(f"{cfg},{1e3*best:.3f},{B/best:.0f}")
