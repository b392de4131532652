"""SP-vs-DP overhead curve on the attached accelerator (round-5 evidence).

Measures the forced SP-decomposed train step against the plain DP step on
the same 1-device mesh (every collective a no-op, isolating the shard_map
loss restructuring) at N = 2048..16384, interleaving the two modes'
timing windows so tunnel-contention drift cancels. Produces the table
recorded in docs/RESULTS.md (round-5 "SP decomposition cost" entry).

Run from the repo root on a machine with an accelerator:
    python tools/probe_sp_overhead.py
(~10 compiles on a cold cache; minutes when warm.)"""
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

import jax
import jax.numpy as jnp

from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.parallel import mesh as meshlib
from pointnet_autoencoder_tpu.parallel import sp
from pointnet_autoencoder_tpu.train import schedules
from pointnet_autoencoder_tpu.train.loop import make_step_fns
from pointnet_autoencoder_tpu.train.state import TrainState, make_optimizer

_cpu = jax.local_devices(backend="cpu")[0]
mesh = meshlib.make_mesh()
spec = get_model_spec("model")


def mark(m):
    print(m, file=sys.stderr, flush=True)


def build(B, N, mode):
    lr = schedules.learning_rate_schedule(0.001, 0.7, B, 200000)
    bn = schedules.bn_momentum_schedule(B, 200000)
    tx = make_optimizer("adam", lr)
    with jax.default_device(_cpu):
        model, variables = spec.init_variables(
            jax.random.PRNGKey(0), N, dtype=jnp.bfloat16)
        host_state = TrainState.create(variables, tx)
    state = meshlib.replicate(mesh, host_state)
    sharding = (sp.point_batch_sharding(mesh) if mode == "sp"
                else meshlib.batch_sharding(mesh))
    batches = [
        jax.device_put(
            np.random.RandomState(i).randn(B, N, 3).astype(np.float32),
            sharding)
        for i in range(2)
    ]
    if mode == "sp":
        train_step, _ = sp.make_sp_step_fns(model, spec, tx, bn, lr, mesh)
    else:
        train_step, _ = make_step_fns(model, spec, tx, bn, lr)
    step = jax.jit(train_step, donate_argnums=(0,)).lower(
        state, batches[0]).compile()
    for i in range(3):
        state, metrics = step(state, batches[i % 2])
    float(metrics["loss"])
    return [step, state, batches, float("inf")]


CONFIGS = [(32, 2048), (4, 2048), (4, 4096), (4, 8192), (4, 16384)]
ITERS = {2048: 150, 4096: 100, 8192: 60, 16384: 25}
WINDOWS = int(os.environ.get("PROBE_WINDOWS", "4"))
# Smoke hook: PROBE_SCALE=0.1 shrinks the timing loops (and PROBE_CONFIGS=1
# keeps only the flagship shape) so the tool itself stays verifiable
# without the full minutes-scale run.
_scale = float(os.environ.get("PROBE_SCALE", "1"))
ITERS = {n: max(1, int(it * _scale)) for n, it in ITERS.items()}
CONFIGS = CONFIGS[:int(os.environ.get("PROBE_CONFIGS", len(CONFIGS)))]

rows = []
for B, N in CONFIGS:
    runs = {m: build(B, N, m) for m in ("dp", "sp")}
    it = ITERS[N]
    for w in range(WINDOWS):
        for m in ("dp", "sp"):
            step, state, batches, best = runs[m]
            t0 = time.perf_counter()
            for i in range(it):
                state, metrics = step(state, batches[i % 2])
            float(metrics["loss"])
            dt = (time.perf_counter() - t0) / it
            runs[m][1] = state
            runs[m][3] = min(best, dt)
            mark(f"B={B} N={N} {m} w{w}: {1e3*dt:.3f} ms")
    rows.append((B, N, runs["dp"][3], runs["sp"][3]))

print("B,N,dp_step_ms,sp_step_ms,sp_overhead_pct")
for B, N, dp, spd in rows:
    print(f"{B},{N},{1e3*dp:.3f},{1e3*spd:.3f},{100*(spd/dp-1):+.1f}")
