"""Training runtime: jitted steps, epoch loops, checkpoints, logging.

The TPU-native redesign of the reference's session-driven loop
(train.py:94-250):

- One jitted, donated train step: forward + loss + backward + optimizer +
  BN moving-stat update, compiled once by XLA. Schedules (LR staircase,
  bn_decay) are jnp functions of the step *inside* the jit, replacing the
  reference's schedule tensors.
- Parallelism by construction: batches are sharded over the mesh's 'data'
  axis and state leaves carry their parallel/tp.py shardings (replicated,
  or decoder FC weights column/row-sharded over 'model' when
  model_parallel > 1); GSPMD inserts the gradient all-reduce, the
  BatchNorm global-batch reductions, and the TP collectives over ICI.
  Single device is just the degenerate 1-device mesh.
- Epoch structure, logging cadence (running means every 10 batches,
  train.py:208-214), eval policy and checkpoint policy (best + every 10
  epochs) match the reference observably.
- Multi-step dispatch in device-input mode: log_every train steps run as
  one lax.scan per device call, and metric fetches defer to the epoch end,
  so per-step host work is zero. Host RPC overhead (measured 3-20 ms/step
  on the tunneled dev backend, ~0.1 ms on a bare host) comes off the step
  path entirely; end-to-end training runs at device speed.
"""

from __future__ import annotations

import functools
import signal
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointnet_autoencoder_tpu.config import TrainConfig
from pointnet_autoencoder_tpu.data.device_pipeline import (
    DeviceBatchIterator,
    DeviceDataset,
    assemble_batch,
)
from pointnet_autoencoder_tpu.data.pipeline import BatchPipeline
from pointnet_autoencoder_tpu.data.shapenet_part import PartDataset
from pointnet_autoencoder_tpu.models.autoencoder import ModelSpec
from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.parallel import mesh as meshlib
from pointnet_autoencoder_tpu.parallel import sp, tp
from pointnet_autoencoder_tpu.train import master, schedules
from pointnet_autoencoder_tpu.train.checkpoint import (
    AsyncSaver,
    CheckpointManager,
)
from pointnet_autoencoder_tpu.train.logging import Logger, snapshot_config
from pointnet_autoencoder_tpu.train.state import TrainState, make_optimizer


@functools.partial(jax.jit, static_argnames="keys")
def _stack_metrics(pending, keys: Tuple[str, ...]) -> jax.Array:
    """(len(pending), len(keys)) f32 from a list of scalar-metric dicts.

    Logging fetches go through this so a log boundary costs ONE
    device->host transfer instead of len(pending) x len(keys) tiny ones.
    On tunneled backends each transfer is a full RPC round trip (~25 ms
    measured -- CLAUDE.md), so the naive jax.device_get(pending) of 10
    dicts x 4 scalars costs ~1 s and dominated end-to-end training wall
    time (~40 ms/step of host overhead vs the 2.7 ms device step)."""
    return jnp.stack(
        [jnp.stack([m[k].astype(jnp.float32) for k in keys])
         for m in pending]
    )


def fetch_metric_means(pending: Sequence[Dict[str, jax.Array]]
                       ) -> Dict[str, float]:
    """Mean of each metric over a list of device-resident metric dicts,
    via a single stacked transfer (see _stack_metrics)."""
    keys = tuple(sorted(pending[0]))
    vals = jax.device_get(_stack_metrics(list(pending), keys))
    return {k: float(v) for k, v in zip(keys, vals.mean(axis=0))}


def make_step_fns(model, spec: ModelSpec, tx, bn_schedule: Callable,
                  lr_schedule: Callable, pred_sharding=None,
                  stochastic_round: bool = False):
    """Builds (train_step, eval_step). Pure functions of (state, batch);
    the autoencoder's label is the (augmented) input batch itself
    (train.py:202-204).

    ``pred_sharding``: optional NamedSharding the decoder output is
    constrained to before the loss. Under tensor parallelism the decoder
    leaves ``pred`` sharded along the point axis of the 'model' mesh axis;
    the loss kernels run batch-sharded, so the Trainer passes the batch
    sharding here and GSPMD places the TP all-gather exactly at this seam.

    ``stochastic_round``: apply optimizer updates to bf16 master params
    with stochastic rounding (train/master.py; the --bf16_params mode).
    """

    def constrain(pred):
        if pred_sharding is not None:
            pred = jax.lax.with_sharding_constraint(pred, pred_sharding)
        return pred

    def train_step(state: TrainState, batch: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        bn_momentum = bn_schedule(state.step)

        def loss_fn(params):
            (pred, end_points), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, bn_momentum=bn_momentum,
                mutable=["batch_stats"],
            )
            loss, metrics = spec.loss_fn(constrain(pred), batch, end_points)
            return loss, (metrics, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if stochastic_round:
            new_params = master.apply_updates_sr(state.params, updates,
                                                 state.step)
        else:
            new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["learning_rate"] = lr_schedule(state.step)
        metrics["bn_decay"] = bn_momentum
        return new_state, metrics

    def eval_step(state: TrainState, batch: jax.Array) -> Dict[str, jax.Array]:
        pred, end_points = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, bn_momentum=0.0,
        )
        loss, metrics = spec.loss_fn(constrain(pred), batch, end_points)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return train_step, eval_step


class Trainer:
    """End-to-end training driver. Datasets may be injected (tests, custom
    data); otherwise they are built from config.data_path."""

    def __init__(self, config: TrainConfig,
                 train_dataset: Optional[PartDataset] = None,
                 test_dataset: Optional[PartDataset] = None,
                 logger: Optional[Logger] = None):
        self.config = config
        self._owns_logger = logger is None
        self._closed = False
        self.logger = logger or Logger(config.log_dir)
        snapshot_config(config.log_dir, config)

        self.mesh = meshlib.make_mesh(data_parallel=config.data_parallel,
                                      model_parallel=config.model_parallel)
        if config.point_parallel:
            # SP training (parallel/sp.py): the POINT axis shards over the
            # mesh's data axis instead of the batch; the batch replicates,
            # so its divisibility constraint moves to num_point.
            if config.model_parallel > 1:
                raise ValueError(
                    "--point_parallel does not compose with "
                    "--model_parallel (the TP decoder's point-sharded "
                    "output conflicts with the SP losses' replicated "
                    "pred seam)")
            k = self.mesh.shape[meshlib.DATA_AXIS]
            if config.num_point % k != 0:
                raise ValueError(
                    f"--point_parallel needs num_point divisible by the "
                    f"data-axis size ({config.num_point} % {k} != 0)")
        else:
            meshlib.check_batch_divisible(config.batch_size, self.mesh)

        class_choice = [config.category] if config.category else None
        self.train_dataset = train_dataset or PartDataset(
            config.data_path, npoints=config.num_point,
            class_choice=class_choice, split="trainval", seed=config.seed,
            cache_dir=config.cache_dir,
        )
        self.test_dataset = test_dataset or PartDataset(
            config.data_path, npoints=config.num_point,
            class_choice=class_choice, split="test", seed=config.seed + 1,
            cache_dir=config.cache_dir,
        )

        batch_sharding = (sp.point_batch_sharding(self.mesh)
                          if config.point_parallel
                          else meshlib.batch_sharding(self.mesh))
        self.input_mode = config.input_mode
        if self.input_mode == "device":
            # HBM-resident dataset: resample+rotate on-device; per step the
            # host transfers only a (B,) index vector and a PRNG key.
            replicated = meshlib.replicated(self.mesh)
            self.train_device = DeviceDataset(self.train_dataset,
                                              sharding=replicated)
            self.eval_device = DeviceDataset(self.test_dataset,
                                             sharding=replicated)
            self.train_pipe = DeviceBatchIterator(
                self.train_device.num_shapes, config.batch_size,
                shuffle=True, seed=config.seed,
            )
            self.eval_pipe = DeviceBatchIterator(
                self.eval_device.num_shapes, config.batch_size,
                shuffle=False, seed=config.seed + 1,
            )
        else:
            self.train_pipe = BatchPipeline(
                self.train_dataset, config.batch_size,
                rotate=not config.no_rotation, shuffle=True,
                sharding=batch_sharding, seed=config.seed,
            )
            self.eval_pipe = BatchPipeline(
                self.test_dataset, config.batch_size, rotate=False,
                shuffle=False, sharding=batch_sharding, seed=config.seed,
            )

        self.spec = get_model_spec(config.model)
        dtype = jnp.bfloat16 if config.bf16 else jnp.float32
        self.model, variables = self.spec.init_variables(
            jax.random.PRNGKey(config.seed), config.num_point,
            config.batch_size, dtype=dtype,
        )
        lr = schedules.learning_rate_schedule(
            config.learning_rate, config.decay_rate, config.batch_size,
            config.decay_step, floor=config.lr_floor,
        )
        bn = schedules.bn_momentum_schedule(config.batch_size,
                                            config.decay_step)
        self.tx = make_optimizer(config.optimizer, lr, config.momentum)
        if config.bf16_params:
            # bf16 master weights: matmul params stored bf16, optimizer
            # state/arithmetic still f32, updates applied with stochastic
            # rounding (train/master.py).
            variables = dict(variables)
            variables["params"] = master.cast_master_bf16(variables["params"])
            self.tx = master.f32_math(self.tx)
        if config.bf16_moments:
            # bf16 Adam moment storage for the matmul class (outermost
            # wrapper: math stays f32 inside, stores round stochastically).
            self.tx = master.bf16_moments(self.tx)
        # tp.shard_state places decoder FC weights over the 'model' axis
        # (identical to plain replication when model_parallel == 1).
        self.state = tp.shard_state(
            self.mesh, TrainState.create(variables, self.tx)
        )

        # Whether the SP-decomposed step is actually in use (tests/intros-
        # pection; False for --point_parallel on a 1-device point mesh).
        self.sp_active = (config.point_parallel
                          and self.mesh.shape[meshlib.DATA_AXIS] > 1)
        if self.sp_active:
            # SP step: shard_map losses + GSPMD-sharded encoder
            # (parallel/sp.py); pred replicates at the loss seam.
            train_step, eval_step = sp.make_sp_step_fns(
                self.model, self.spec, self.tx, bn, lr, self.mesh,
                stochastic_round=config.bf16_params,
            )
        else:
            # Includes --point_parallel on a 1-device point mesh: the SP
            # decomposition's collectives are all no-ops there, so degree
            # 1 compiles the plain step -- bit-exact DP parity by
            # construction (it IS the DP program; the decomposed step
            # matches to 1 ulp, pinned by test). At jitted-step
            # granularity the decomposition is actually free-to-faster
            # (docs/RESULTS.md round-5 SP table); the bypass is kept for
            # the bit-exactness guarantee, not speed. SP engages when the
            # point axis actually shards.
            train_step, eval_step = make_step_fns(
                self.model, self.spec, self.tx, bn, lr,
                stochastic_round=config.bf16_params,
                # Under TP the decoder output is point-sharded over
                # 'model'; gather it to the loss kernels' batch sharding
                # at the seam.
                pred_sharding=(batch_sharding
                               if self.mesh.shape[meshlib.MODEL_AXIS] > 1
                               else None),
            )
        if self.input_mode == "device":
            num_point = config.num_point
            rotate = not config.no_rotation

            # Multi-step dispatch: K train steps per device call under one
            # lax.scan (K = log_every, so the sync cadence and the logging
            # cadence coincide). On the tunneled dev backend every dispatch
            # is a host RPC (~3-10 ms, vs the 2.7 ms device step); per-step
            # dispatch capped end-to-end training at ~1k shapes/s while the
            # chunked form runs at device speed (measured: 0.35 ms/step of
            # host overhead vs 6-20 ms/step). On a bare TPU host the same
            # change amortizes the ordinary ~0.1 ms dispatch cost.
            def device_train_chunk(state, data, lengths, idxs, key):
                keys = jax.random.split(key, idxs.shape[0])

                def body(st, xs):
                    ix, k = xs
                    batch = assemble_batch(data, lengths, ix, k, num_point,
                                           rotate)
                    batch = jax.lax.with_sharding_constraint(
                        batch, batch_sharding)
                    return train_step(st, batch)

                return jax.lax.scan(body, state, (idxs, keys))

            def device_eval_chunk(state, data, lengths, idxs, key):
                keys = jax.random.split(key, idxs.shape[0])

                def body(carry, xs):
                    ix, k = xs
                    batch = assemble_batch(data, lengths, ix, k, num_point,
                                           rotate=False)
                    batch = jax.lax.with_sharding_constraint(
                        batch, batch_sharding)
                    return carry, eval_step(state, batch)

                _, metrics = jax.lax.scan(body, 0, (idxs, keys))
                return metrics

            self._device_train_chunk = jax.jit(device_train_chunk,
                                               donate_argnums=(0,))
            self._device_eval_chunk = jax.jit(device_eval_chunk)
        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

        self.ckpt = CheckpointManager(config.log_dir)
        if config.async_checkpoints:
            self._saver = AsyncSaver(self.ckpt, log=self.logger.log)
            # On-device state copy: one dispatch, fresh (non-donated)
            # buffers the worker can fetch while training continues.
            self._snapshot_fn = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t))
        else:
            self._saver = None
            self._snapshot_fn = None
        # (step, device snapshot): a best + periodic save in the same
        # epoch shares one snapshot, so its bytes transfer once.
        self._snap_cache: Optional[Tuple[int, Any]] = None
        self.start_epoch = 0
        self.best_loss = float("inf")
        # Host-side mirror of state.step (fresh state starts at 0); resume
        # re-seeds it from the checkpoint. See _host_step.
        self._step_cache: Optional[int] = 0
        # Preemption protocol (SIGTERM/SIGINT while train() runs): the
        # handler sets this flag, the batch loop exits at the next dispatch
        # boundary (per step in host mode, per log_every-step chunk in
        # device mode -- ~30 ms of device work), and train() writes a
        # resumable checkpoint before returning. TPU preemption notices
        # are short; reacting inside the epoch keeps the save within the
        # grace window.
        self._preempted = False
        if config.resume:
            self._try_resume()

    # -- checkpoint glue ----------------------------------------------------

    def _ckpt_tree(self):
        return {
            "state": self.state,
            "epoch": self.start_epoch,
            "best_loss": self.best_loss,
        }

    def _try_resume(self):
        path = self.ckpt.latest()
        if path is None:
            self.logger.log("resume requested but no checkpoint found; "
                            "starting fresh")
            return
        restored = self.ckpt.restore(path, self._ckpt_tree())
        self.state = tp.shard_state(self.mesh, restored["state"])
        self.start_epoch = int(restored["epoch"])
        self.best_loss = float(restored["best_loss"])
        self._step_cache = int(jax.device_get(restored["state"].step))
        self.logger.log(
            f"resumed from {path} at epoch {self.start_epoch} "
            f"(best eval loss {self.best_loss:.6f})"
        )

    def _save(self, kind: str, epoch: int):
        if self._saver is not None:
            step = self._host_step()
            if self._snap_cache is None or self._snap_cache[0] != step:
                self._snap_cache = (step, self._snapshot_fn(self.state))
            tree = {
                "state": self._snap_cache[1],
                "epoch": epoch + 1,
                "best_loss": self.best_loss,
            }
            # The reference's "Model saved in file:" line prints from the
            # worker when the save is durable.
            self._saver.submit(kind, epoch, tree)
            return
        tree = {
            "state": jax.device_get(self.state),
            "epoch": epoch + 1,
            "best_loss": self.best_loss,
        }
        if kind == "best":
            path = self.ckpt.save_best(epoch, tree)
        else:
            path = self.ckpt.save_periodic(tree)
        self.logger.log(f"Model saved in file: {path}")

    # -- epoch loops --------------------------------------------------------

    def train_one_epoch(self, epoch: int) -> None:
        cfg = self.config
        log = self.logger
        num_batches = len(self.train_pipe)
        if num_batches == 0:
            # The reference's len//batch_size semantics make this a silent
            # no-op epoch (train.py:187); surface it instead.
            log.log(
                f"WARNING: 0 train batches (dataset has "
                f"{len(self.train_dataset)} shapes < batch_size "
                f"{cfg.batch_size}); epoch is a no-op"
            )
        # The step counter is tracked host-side (each train step advances it
        # by exactly 1), so neither log lines nor eval epochs pay a blocking
        # device fetch (~25 ms RTT on the tunneled backend) to learn it.
        start_step = self._host_step()
        t0 = time.time()
        if self.input_mode == "device":
            steps_done, shapes = self._train_epoch_device(start_step,
                                                          num_batches)
        else:
            steps_done, shapes = self._train_epoch_host(start_step,
                                                        num_batches)
        self._step_cache = start_step + steps_done
        dt = time.time() - t0
        if dt > 0:
            log.log(f"epoch throughput: {shapes / dt:.1f} shapes/sec")

    def _train_epoch_device(self, start_step: int, num_batches: int
                            ) -> Tuple[int, int]:
        """Device-input epoch: log_every steps per dispatch (one lax.scan),
        with ALL metric fetches deferred to the epoch end -- the epoch's
        host cost is one async dispatch RPC per chunk plus one transfer.
        Log lines therefore print at the epoch boundary; their content
        (per-log_every running means, reference train.py:208-214) is
        identical to the streaming form."""
        cfg = self.config
        log = self.logger
        chunks = []  # (first_batch_idx, size, device metrics of (K,) leaves)
        steps_done = 0
        for idxs, key in self.train_pipe.epoch_chunks(cfg.log_every):
            if self._preempted:
                break
            self.state, metrics = self._device_train_chunk(
                self.state, self.train_device.data,
                self.train_device.lengths, idxs, key,
            )
            chunks.append((steps_done, idxs.shape[0], metrics))
            steps_done += idxs.shape[0]
        # One epoch-end fetch; doubles as the device-completion barrier
        # (block_until_ready is unreliable on tunneled backends).
        fetched = jax.device_get([m for (_, _, m) in chunks])
        for (first, size, _), m in zip(chunks, fetched):
            if size != cfg.log_every:
                continue  # the reference logs only at full log_every marks
            means = {k: float(np.mean(np.asarray(v, np.float32)))
                     for k, v in m.items()}
            log.log(f" -- {first + size:03d} / {num_batches:03d} --")
            log.log(f"mean loss: {means['loss']:.6f}")
            log.log(f"mean pc loss: {means['pcloss']:.6f}")
            log.scalars("train", start_step + first + size, means)
        return steps_done, steps_done * cfg.batch_size

    def _train_epoch_host(self, start_step: int, num_batches: int
                          ) -> Tuple[int, int]:
        """Host-input epoch (reference-style assembly): one dispatch per
        step, metric fetch per log boundary via a single stacked transfer
        (fetch_metric_means)."""
        cfg = self.config
        log = self.logger
        pending = []
        steps_done = 0
        for batch_idx, batch in enumerate(self.train_pipe.epoch()):
            if self._preempted:
                break
            self.state, metrics = self._train_step(self.state, batch)
            steps_done += 1
            pending.append(metrics)
            if (batch_idx + 1) % cfg.log_every == 0:
                means = fetch_metric_means(pending)
                pending = []
                log.log(f" -- {batch_idx + 1:03d} / {num_batches:03d} --")
                log.log(f"mean loss: {means['loss']:.6f}")
                log.log(f"mean pc loss: {means['pcloss']:.6f}")
                log.scalars("train", start_step + batch_idx + 1, means)
        # One sync so the epoch time reflects device completion.
        if pending:
            jax.device_get(pending[-1]["loss"])
        return steps_done, steps_done * cfg.batch_size

    def eval_one_epoch(self, epoch: int) -> float:
        log = self.logger
        log.log(f"---- EPOCH {epoch:03d} EVALUATION ----")
        if self.input_mode == "device":
            # The whole eval epoch is ONE scan dispatch + one fetch (the
            # eval split length is fixed, so this compiles once per run).
            n_eval = len(self.eval_pipe)
            if n_eval == 0:
                log.log("eval skipped: test split smaller than one batch")
                return float("inf")
            (idxs, key), = self.eval_pipe.epoch_chunks(n_eval)
            metrics = self._device_eval_chunk(
                self.state, self.eval_device.data,
                self.eval_device.lengths, idxs, key,
            )
            means = {k: float(np.mean(np.asarray(v, np.float32)))
                     for k, v in jax.device_get(metrics).items()}
        else:
            pending = [self._eval_step(self.state, batch)
                       for batch in self.eval_pipe.epoch()]
            if not pending:
                log.log("eval skipped: test split smaller than one batch")
                return float("inf")
            means = fetch_metric_means(pending)
        log.log(f"eval mean loss: {means['loss']:.6f}")
        log.log(f"eval mean pc loss: {means['pcloss']:.6f}")
        log.scalars("test", self._host_step(), means)
        return means["loss"]

    def _host_step(self) -> int:
        """The global step, tracked host-side. Fetched from the device once
        (at construction / resume); every subsequent train step advances it
        by exactly 1, so train_one_epoch maintains it without per-epoch
        blocking fetches."""
        if self._step_cache is None:
            self._step_cache = int(jax.device_get(self.state.step))
        return self._step_cache

    def flush(self) -> None:
        """Make every checkpoint and log record scheduled so far durable
        WITHOUT releasing anything: drains in-flight async saves and
        flushes the logger's buffered TensorBoard writers. train() calls
        this on exit, so a preempted Trainer stays fully usable for a
        follow-up train()/eval_one_epoch() in the same process."""
        if self._saver is not None:
            self._saver.flush()
        self.logger.flush()

    def close(self) -> None:
        """Release the async saver, the checkpoint manager, and (if this
        Trainer created it) the logger. Idempotent. After close() the
        Trainer cannot train or save again -- embedded callers that
        re-train a preempted Trainer must not close it in between."""
        if self._closed:
            return
        self._closed = True
        if self._saver is not None:
            self._saver.close()
            self._saver = None
        if self._owns_logger:
            self.logger.close()
        self.ckpt.close()

    def _save_preempt(self, epoch: int) -> None:
        """Resumable mid-run checkpoint: stored epoch pointer = the
        interrupted epoch, so ``--resume`` restarts it from its beginning
        (epoch-granular resume; the partial epoch's updates are kept in
        the params, which only affects which shapes train twice)."""
        self.logger.log(
            f"received signal {getattr(self, '_preempt_signum', '?')}: "
            f"stopping at a step boundary"
        )
        if self._saver is not None:
            # Earlier async saves must land before the preemption save
            # overwrites LATEST; the save itself is synchronous — it must
            # be durable before the process exits.
            self._saver.flush()
        tree = {
            "state": jax.device_get(self.state),
            "epoch": epoch,
            "best_loss": self.best_loss,
        }
        path = self.ckpt.save_periodic(tree)
        self.logger.log(
            f"preemption checkpoint saved: {path} "
            f"(--resume restarts epoch {epoch})"
        )

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT request a checkpoint-and-exit instead of killing
        the run mid-step. A SECOND signal restores the previous handlers
        (so a double Ctrl-C still interrupts hard). No-op outside the main
        thread (signal handlers can only be installed there)."""
        previous = {}

        def restore():
            for sig, h in previous.items():
                try:
                    signal.signal(sig, h)
                except ValueError:
                    pass

        def request_stop(signum, frame):
            if self._preempted:  # second signal: give up gracefulness
                restore()
                raise KeyboardInterrupt
            self._preempted = True
            self._preempt_signum = signum
            # Async-signal-context: the main thread may be INSIDE the
            # logger's buffered file write, which is not reentrant
            # (a logger.log here can raise 'reentrant call inside
            # BufferedWriter' and kill the run before the checkpoint).
            # os.write to stderr is safe; the loop logs properly once it
            # observes the flag.
            import os as _os

            _os.write(2, (f"\nreceived signal {signum}: checkpointing at "
                          f"the next step boundary, then exiting (signal "
                          f"again to kill)\n").encode())

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                previous[sig] = signal.signal(sig, request_stop)
        except ValueError:
            return lambda: None  # not the main thread (embedded callers)
        return restore

    def train(self) -> float:
        cfg = self.config
        # A Trainer preempted once must be trainable again in-process
        # (embedded callers); the flag is per-train()-call state.
        self._preempted = False
        restore_signals = self._install_signal_handlers()
        try:
            if cfg.eval_only:
                loss = self.eval_one_epoch(self.start_epoch)
                self.logger.log(f"eval-only mode; eval loss {loss:.6f}")
                return loss
            profiled = False
            for epoch in range(self.start_epoch, cfg.max_epoch):
                self.logger.log(f"**** EPOCH {epoch:03d} ****")
                if cfg.profile_dir and not profiled:
                    with jax.profiler.trace(cfg.profile_dir):
                        self.train_one_epoch(epoch)
                    profiled = True
                    self.logger.log(
                        f"profiler trace written to {cfg.profile_dir}")
                else:
                    self.train_one_epoch(epoch)
                if self._preempted:
                    self._save_preempt(epoch)
                    return self.best_loss
                epoch_loss = self.eval_one_epoch(epoch)
                if epoch_loss < self.best_loss:
                    self.best_loss = epoch_loss
                    self._save("best", epoch)
                if epoch % 10 == 0:
                    self._save("periodic", epoch)
                if self._preempted:
                    # Signal landed during eval/saving: this epoch DID
                    # complete, so the resume pointer moves past it.
                    self._save_preempt(epoch + 1)
                    return self.best_loss
            return self.best_loss
        finally:
            restore_signals()
            # Durability without teardown: a preempted (or finished)
            # Trainer must remain re-trainable in-process; callers that
            # are done with it call close().
            self.flush()
