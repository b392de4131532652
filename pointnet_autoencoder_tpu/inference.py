"""Inference sessions: checkpoint -> jitted reconstruction/embedding.

Generalizes the reference's test.py inference path (test.py:37-69: rebuild
graph, restore Saver, sess.run per batch) into a reusable serving surface:
one object owns the restored variables and compiled functions; callers feed
numpy or jax arrays of shape (B, num_point, 3) (or a single (num_point, 3)
cloud) and get reconstructions, embeddings, and per-shape Chamfer.

Functions are compiled once per batch shape; ragged final batches are
padded to the compiled batch size and sliced, so looping a whole dataset
reuses a single executable.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_autoencoder_tpu.models.autoencoder import DECODERS
from pointnet_autoencoder_tpu.models.registry import get_model_spec
from pointnet_autoencoder_tpu.ops.chamfer import fscore as _fscore_op
from pointnet_autoencoder_tpu.ops.chamfer import nn_distance
from pointnet_autoencoder_tpu.train import master
from pointnet_autoencoder_tpu.train.checkpoint import CheckpointManager
from pointnet_autoencoder_tpu.train.state import TrainState, make_optimizer


_BUNDLE_META = "bundle_meta.json"


def chunked_dispatch(run, arr: np.ndarray, chunk_size: int):
    """Stream ``arr`` (leading axis) through ``run`` in compiled-size
    chunks: the ragged tail is zero-padded to ``chunk_size`` (one
    executable serves any request size), every chunk is dispatched before
    any result is fetched (dispatch is async, so device compute overlaps
    the host transfers), and the padding is sliced back off.

    ``run(chunk)`` returns one device array or a tuple of them (``None``
    entries stay ``None`` — the caller didn't want that output fetched).
    Returns the concatenated array, or a tuple of them when ``run`` does.
    Shared by ``InferenceSession._run``/``decode`` and the
    pipeline-parallel microbatch loop (parallel/pp.py)."""
    pending = []  # (tuple of device results, pad rows in this chunk)
    for s in range(0, arr.shape[0], chunk_size):
        chunk = arr[s:s + chunk_size]
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], arr.dtype)]
            )
        res = run(chunk)
        pending.append((res if isinstance(res, tuple) else (res,), pad))
    width = len(pending[0][0])
    cols = [
        None if pending[0][0][j] is None else np.concatenate(
            [np.asarray(res[j])[:chunk_size - pad] for res, pad in pending]
        )
        for j in range(width)
    ]
    return tuple(cols) if width > 1 else cols[0]


def _optimizer_candidates(ckpt_dir: str):
    """(optimizer_name, momentum, bf16_params, bf16_moments) guesses for a
    checkpoint directory, best first: the run's snapshotted config.json if
    present, then every known optimizer-state layout. The bf16 flags change
    the stored tree the same way the Trainer wires them (train/loop.py:
    cast_master_bf16 + f32_math for ``--bf16_params``; the (count, inner)
    bf16_moments wrapper for ``--bf16_moments``), so the abstract restore
    tree must mirror them or orbax rejects the structure. The reference's
    Saver restore has no analog problem (TF restores by variable name,
    test.py:51); here the optimizer slots live in the checkpoint tree."""
    candidates = []
    cfg_path = os.path.join(ckpt_dir, "config.json")
    if os.path.exists(cfg_path):
        try:
            with open(cfg_path) as f:
                cfg = json.load(f)
            if cfg.get("optimizer"):
                candidates.append(
                    (cfg["optimizer"], float(cfg.get("momentum", 0.9)),
                     bool(cfg.get("bf16_params", False)),
                     bool(cfg.get("bf16_moments", False)))
                )
        except (OSError, ValueError):
            pass
    for name in ("adam", "momentum"):
        for p16 in (False, True):
            for m16 in (False, True):
                c = (name, 0.9, p16, m16)
                if not any(c[0] == o[0] and c[2:] == o[2:]
                           for o in candidates):
                    candidates.append(c)
    return candidates


class InferenceSession:
    """Restores a training checkpoint and serves the model.

    Args:
      model: registry name ('model', 'model_emd', ...).
      model_path: checkpoint directory written by the trainer
        (e.g. log/model.ckpt or log/best_model_epoch_087.ckpt).
      num_point: points per shape the model was trained with.
      batch_size: compiled batch size; inputs are padded/split to it.
      data_parallel: shard serving over this many devices (must divide
        batch_size). Variables are replicated and every compiled batch is
        split along the mesh's 'data' axis, exactly like the training
        step's GSPMD layout (parallel/mesh.py) -- multi-chip serving with
        no change to the call surface. Default: single-device, matching
        the reference's one-GPU test.py. The reference has no analog.
      model_parallel: tensor-parallel degree over the decoder FC stacks
        (parallel/tp.py), composable with data_parallel; the restored
        decoder weights are placed column/row-sharded over the mesh's
        'model' axis and GSPMD inserts the serving-time collectives.
      bf16: serve with bfloat16 matmuls AND bfloat16-stored weights
        (BN statistics stay f32). The training default is already bf16
        compute, and the apply path casts f32 weights to bf16 at every
        matmul -- so storing them pre-cast is BIT-IDENTICAL to f32 storage
        under bf16 compute (measured max abs output delta 0.0 on the TPU,
        docs/ARCHITECTURE.md round-4 serving entry) while halving weight
        HBM/transfer bytes; measured ~2-9%% faster forwards at B>=128.
        Default False preserves the f32 (HIGHEST-precision) serving
        numerics shipped previously.
    """

    def __init__(self, model: str, model_path: str, num_point: int,
                 batch_size: int = 32,
                 data_parallel: Optional[int] = None,
                 model_parallel: int = 1,
                 bf16: bool = False):
        self.model_name = model
        self.num_point = num_point
        self.batch_size = batch_size
        self.bf16 = bf16
        self._mesh = None
        if (data_parallel is not None and data_parallel > 1) \
                or model_parallel > 1:
            from pointnet_autoencoder_tpu.parallel import mesh as meshlib

            self._mesh = meshlib.make_mesh(data_parallel=data_parallel,
                                           model_parallel=model_parallel)
            meshlib.check_batch_divisible(batch_size, self._mesh)
            self._batch_sharding = meshlib.batch_sharding(self._mesh)
        spec = get_model_spec(model)
        self._spec = spec
        self._dtype = jnp.bfloat16 if bf16 else jnp.float32
        self._model, variables = spec.init_variables(
            jax.random.PRNGKey(0), num_point, dtype=self._dtype
        )
        if os.path.exists(os.path.join(model_path, _BUNDLE_META)):
            # Params-only serving bundle (see export_bundle): restores
            # without reconstructing any optimizer state.
            mgr = CheckpointManager(os.path.dirname(
                os.path.abspath(model_path)) or ".")
            self._variables = mgr.restore(
                os.path.join(model_path, "variables.ckpt"),
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
            )
        else:
            self._variables = self._restore_train_ckpt(model_path, variables)

        if bf16:
            # Store matmul weights pre-cast: the bf16 apply path casts f32
            # weights to bf16 at every use anyway, so this is the same
            # arithmetic with half the weight HBM. BN statistics are not
            # params and stay f32.
            self._variables = {
                "params": jax.tree_util.tree_map(
                    lambda x: (x.astype(jnp.bfloat16)
                               if x.dtype == jnp.float32 else x),
                    self._variables["params"]),
                "batch_stats": self._variables.get("batch_stats", {}),
            }

        if self._mesh is not None:
            from pointnet_autoencoder_tpu.parallel import tp

            # Replication when the model axis is size 1; decoder FC
            # weights column/row-sharded over 'model' otherwise.
            self._variables = tp.shard_state(self._mesh, self._variables)
            self._put = lambda x: jax.device_put(
                jnp.asarray(x), self._batch_sharding)
        else:
            self._put = jnp.asarray

        # Variables are a jit ARGUMENT (like the train step's state), not a
        # closure constant: constants would be folded into the executable
        # (slow compile, 17 MB binary) and closed-over gather/scatter
        # graphs are the axon backend's documented wrong-numerics class.
        def fwd(variables, points):
            pred, end_points = self._model.apply(
                variables, points, train=False, bn_momentum=0.0
            )
            return pred, end_points["embedding"]

        self._fwd_jit = jax.jit(fwd)
        self._fwd = lambda points: self._fwd_jit(self._variables, points)

        def per_shape_chamfer(pred, target):
            d1, _, d2, _ = nn_distance(pred, target)
            return jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)

        self._chamfer = jax.jit(per_shape_chamfer)
        # threshold is a traced argument: one executable serves any tau.
        self._fscore = jax.jit(_fscore_op)

        # Decoder-only application for latent-space use (decode): the
        # decoder is a named submodule, so the standalone module class
        # applied against the 'decoder' variable sub-tree is exactly the
        # decoder stage of the full forward.
        decoder_module = DECODERS[spec.decoder](num_point, dtype=self._dtype)

        def dec_fwd(dec_vars, feat):
            pred, _extras = decoder_module.apply(
                dec_vars, feat, False, 0.0
            )
            return pred

        self._dec_vars = {
            "params": self._variables["params"]["decoder"],
            "batch_stats": self._variables.get(
                "batch_stats", {}).get("decoder", {}),
        }
        self._dec_jit = jax.jit(dec_fwd)
        self._decode_fn = lambda feat: self._dec_jit(self._dec_vars, feat)

    def _restore_train_ckpt(self, model_path: str, variables):
        # The stored tree is {state: TrainState, epoch, best_loss}; only
        # params/batch_stats matter for inference but the abstract tree must
        # match the stored structure -- including the optimizer slots, which
        # differ between adam and momentum (the reference's two --optimizer
        # choices, train.py:117-120). The trainer snapshots its config next
        # to the checkpoints, so read the optimizer from there when
        # available, then fall back to trying each known optimizer's tree.
        ckpt_dir = os.path.dirname(os.path.abspath(model_path)) or "."
        mgr = CheckpointManager(ckpt_dir)
        restored = None
        errors = []
        for opt_name, momentum, p16, m16 in _optimizer_candidates(ckpt_dir):
            # Everything inside the try: an unrecognized optimizer name
            # from a (possibly newer) config.json must fall through to the
            # known-optimizer candidates, not abort the restore.
            try:
                tx = make_optimizer(opt_name, lambda s: 1e-3, momentum)
                cand_vars = variables
                if p16:
                    # --bf16_params runs store matmul params bf16 and keep
                    # optimizer state f32 (train/loop.py wiring).
                    cand_vars = dict(variables)
                    cand_vars["params"] = master.cast_master_bf16(
                        cand_vars["params"])
                    tx = master.f32_math(tx)
                if m16:
                    tx = master.bf16_moments(tx)
                # eval_shape: the candidate tree is tried for STRUCTURE --
                # materializing params + optimizer slots per failed
                # candidate would cost ~100 MB of device arrays times the
                # (now 8-deep) no-config fallback list (review fix);
                # CheckpointManager.restore only needs shapes/dtypes.
                abstract = jax.eval_shape(lambda v, t=tx: {
                    "state": TrainState.create(v, t),
                    "epoch": 0,
                    "best_loss": 0.0,
                }, cand_vars)
                # NOTE: assign `restored` only after the shape check below
                # passes -- a relaxed-but-mismatched restore must leave it
                # None so the candidate loop keeps trying / finally raises.
                candidate = mgr.restore(model_path, abstract)
                # Orbax relaxes SHAPES for sharding-less ShapeDtypeStruct
                # targets (measured: a num_point=64 checkpoint "restores"
                # into a num_point=128 abstract, returning the stored
                # (1024, 192) fc3 silently). Re-impose the enforcement the
                # concrete-array abstract used to provide; the message
                # carries the phrase the num_point hint below keys on.
                want = jax.tree_util.tree_flatten_with_path(
                    {"params": abstract["state"].params,
                     "batch_stats": abstract["state"].batch_stats})[0]
                got = jax.tree_util.tree_leaves(
                    {"params": candidate["state"].params,
                     "batch_stats": candidate["state"].batch_stats})
                for (path_a, a), r in zip(want, got):
                    if tuple(r.shape) != tuple(a.shape):
                        raise ValueError(
                            f"requested shape {tuple(a.shape)} for leaf "
                            f"{jax.tree_util.keystr(path_a)} is not "
                            f"compatible with the stored shape "
                            f"{tuple(r.shape)}")
                restored = candidate
                break
            except (ValueError, KeyError, TypeError) as e:
                errors.append(f"{opt_name}/p16={p16}/m16={m16}: {e}")
        if restored is None:
            # A mismatch under state.params means the checkpoint's network
            # tree itself differs -- wrong --model, not an optimizer-slot
            # layout issue. Say so up front instead of burying the cause
            # in orbax's per-candidate tree dumps.
            hint = ""
            if any("state.params" in e for e in errors):
                hint = (
                    f"\nHint: the parameter tree itself mismatches -- this "
                    f"checkpoint was likely trained with a different "
                    f"--model than {self.model_name!r} (each decoder "
                    f"family has its own variable tree)."
                )
            elif any("not compatible with the stored shape" in e
                     for e in errors):
                hint = (
                    f"\nHint: the tree structure matches but array shapes "
                    f"differ -- this checkpoint was likely trained with a "
                    f"different --num_point than {self.num_point} (the "
                    f"decoder output layer scales with it)."
                )
            raise ValueError(
                f"could not restore {model_path} with any known optimizer "
                f"state layout:{hint}\n" + "\n".join(errors)
            )
        return {
            # Serve at the session's own precision regardless of how the
            # run stored its master weights: a --bf16_params checkpoint
            # restores bf16 leaves, which upcast into the (default-f32)
            # serving template here exactly as cli.export does.
            "params": jax.tree.map(
                lambda t, r: r.astype(t.dtype),
                variables["params"], restored["state"].params),
            "batch_stats": restored["state"].batch_stats,
        }

    @property
    def variables(self):
        """The restored inference variables ({params, batch_stats})."""
        return self._variables

    # -- serving bundles ------------------------------------------------------

    def export_bundle(self, out_dir: str) -> str:
        """Write a params-only serving bundle: the inference variables plus
        a metadata file, ~3x smaller than a training checkpoint (no
        optimizer slots) and restorable without knowing the optimizer.
        Load with ``InferenceSession.from_bundle``; the reference has no
        analog (test.py restores the full Saver state, test.py:51)."""
        out_dir = os.path.abspath(out_dir)
        mgr = CheckpointManager(os.path.dirname(out_dir) or ".")
        os.makedirs(out_dir, exist_ok=True)
        # Bundles are stored f32 regardless of the session's compute mode,
        # so any session (f32 or bf16) can open any bundle.
        host_vars = jax.tree_util.tree_map(
            lambda x: (np.asarray(x, np.float32)
                       if x.dtype == jnp.bfloat16 else np.asarray(x)),
            jax.device_get(self._variables))
        mgr.save_tree(os.path.join(out_dir, "variables.ckpt"), host_vars)
        with open(os.path.join(out_dir, _BUNDLE_META), "w") as f:
            json.dump({"format": "pcae-bundle-v1",
                       "model": self.model_name,
                       "num_point": self.num_point}, f)
        return out_dir

    @classmethod
    def from_bundle(cls, bundle_dir: str, batch_size: int = 32,
                    data_parallel: Optional[int] = None,
                    bf16: bool = False) -> "InferenceSession":
        """Open a bundle written by ``export_bundle``; model name and
        num_point come from the bundle's metadata."""
        with open(os.path.join(bundle_dir, _BUNDLE_META)) as f:
            meta = json.load(f)
        return cls(meta["model"], bundle_dir, int(meta["num_point"]),
                   batch_size=batch_size, data_parallel=data_parallel,
                   bf16=bf16)

    # -- helpers --------------------------------------------------------------

    def _batched(self, points: np.ndarray):
        pts = np.asarray(points, np.float32)
        single = pts.ndim == 2
        if single:
            pts = pts[None]
        if pts.shape[1:] != (self.num_point, 3):
            raise ValueError(
                f"expected (*, {self.num_point}, 3), got {pts.shape}"
            )
        return pts, single

    def _run(self, pts: np.ndarray, fetch_pred: bool = True,
             fetch_emb: bool = True):
        """Pad/split to the compiled batch size; returns (pred, emb).

        Only the requested outputs are transferred to the host (each fetch
        is a blocking RTT on tunneled backends); the unrequested slot comes
        back as None."""
        if pts.shape[0] == 0:
            raise ValueError("got 0 input shapes")

        def run(chunk):
            pred, emb = self._fwd(self._put(chunk))
            return (pred if fetch_pred else None,
                    emb if fetch_emb else None)

        return chunked_dispatch(run, pts, self.batch_size)

    # -- public API -----------------------------------------------------------

    def reconstruct(self, points) -> np.ndarray:
        """(B, N, 3) or (N, 3) -> reconstructed cloud(s), same leading shape."""
        pts, single = self._batched(points)
        pred, _ = self._run(pts, fetch_emb=False)
        return pred[0] if single else pred

    def embed(self, points) -> np.ndarray:
        """(B, N, 3) or (N, 3) -> embedding(s) (B, D) / (D,)."""
        pts, single = self._batched(points)
        _, emb = self._run(pts, fetch_pred=False)
        return emb[0] if single else emb

    def decode(self, embeddings) -> np.ndarray:
        """(B, D) or (D,) latent(s) -> decoded cloud(s) (B, num_point, 3).

        Runs the decoder stage alone on externally supplied embeddings —
        latent interpolation/arithmetic/sampling (see
        examples/latent_interp.py). ``decode(embed(x))`` is exactly
        ``reconstruct(x)``. The reference has no analog: test.py only ever
        runs the full forward (test.py:59-69). D must match the dimension
        this model publishes as the 'embedding' end-point.
        """
        emb = np.asarray(embeddings, np.float32)
        single = emb.ndim == 1
        if single:
            emb = emb[None]
        if emb.ndim != 2:
            raise ValueError(f"expected (B, D) or (D,), got {emb.shape}")
        if emb.shape[0] == 0:
            raise ValueError("got 0 embeddings")
        pred = chunked_dispatch(
            lambda chunk: self._decode_fn(self._put(chunk)),
            emb, self.batch_size)
        return pred[0] if single else pred

    def chamfer(self, pred, target) -> np.ndarray:
        """Per-shape raw Chamfer (the reference's pcloss) between two
        (B, N, 3) clouds. Under data_parallel the batch is sharded when
        its size divides the mesh; otherwise it runs replicated."""
        pred = np.asarray(pred, np.float32)
        target = np.asarray(target, np.float32)
        put = self._put
        if self._mesh is not None:
            from pointnet_autoencoder_tpu.parallel.mesh import DATA_AXIS

            if pred.shape[0] % self._mesh.shape[DATA_AXIS] != 0:
                put = jnp.asarray
        return np.asarray(self._chamfer(put(pred), put(target)))

    def fscore(self, pred, target, threshold: float = 0.01) -> np.ndarray:
        """Per-shape reconstruction F-score@threshold between (B, N, 3)
        clouds (ops/chamfer.py:fscore; precision/recall of nearest-neighbor
        distances). Evaluation metric only — the reference reports just
        the raw Chamfer."""
        pred = np.asarray(pred, np.float32)
        target = np.asarray(target, np.float32)
        return np.asarray(self._fscore(
            jnp.asarray(pred), jnp.asarray(target),
            jnp.asarray(threshold, jnp.float32)))

    def evaluate(self, dataset, num_shapes: Optional[int] = None,
                 seed: int = 0):
        """Reconstruct a dataset's shapes; returns (mean_chamfer, per_shape).
        Iterates in a shuffled order like the reference's test loop
        (test.py:79-83)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(dataset))
        if num_shapes is not None:
            order = order[:num_shapes]
        if len(order) == 0:
            raise ValueError(
                f"dataset yielded no shapes (len={len(dataset)}, "
                f"num_shapes={num_shapes})"
            )
        clouds = np.stack([dataset[int(i)][0] for i in order])
        preds, _ = self._run(clouds, fetch_emb=False)
        cds = []
        bs = self.batch_size
        for s in range(0, len(clouds), bs):
            pc, cc = preds[s:s + bs], clouds[s:s + bs]
            # Pad the ragged final chunk so the jitted chamfer keeps its
            # one compiled shape (compiles are slow server-side RPCs here).
            pad = bs - pc.shape[0]
            if pad:
                zeros = np.zeros((pad,) + pc.shape[1:], np.float32)
                pc = np.concatenate([pc, zeros])
                cc = np.concatenate([cc, zeros])
            cds.append(self.chamfer(pc, cc)[:bs - pad])
        per_shape = np.concatenate(cds)
        return float(per_shape.mean()), per_shape
