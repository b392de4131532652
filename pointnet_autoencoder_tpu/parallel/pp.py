"""Pipeline parallelism (serving): encoder and decoder on separate chips.

The fourth parallelism axis, scoped deliberately:

* **Serving**: implemented here. Stage 0 (PointNet encoder + neck FCs)
  and stage 1 (decoder) live on different devices with their own jitted
  programs; a batch streams through as microbatches, and JAX's async
  dispatch overlaps stage 0 of microbatch i+1 with stage 1 of microbatch
  i — the cross-stage activation transfer is a (mb, D) embedding, the
  smallest tensor in the whole forward, riding ICI on real slices.
  Eval-mode BatchNorm uses moving statistics, so microbatched execution
  is *exactly* the unpipelined forward (asserted in tests).

* **Training**: deliberately NOT implemented, for measured reasons, not
  omission. (a) Training-mode BatchNorm normalizes with global-batch
  statistics (the reference's single-GPU semantics, which this
  framework's data-parallel step reproduces exactly via GSPMD
  reductions); GPipe-style microbatching would normalize each
  microbatch by its own statistics and silently change the training
  function. (b) The architecture has no stage depth: the conv5 matmul
  (128->1024 over B*N points) is ~78% of encoder FLOPs and cannot be
  balanced against the ~3%-of-FLOPs decoder FC stack, so a bubble-free
  schedule does not exist — the right scaling axes for this family are
  data (batch), tensor (decoder columns, parallel/tp.py), and point
  (loss N, parallel/sp.py), all three of which are implemented and
  equivalence-tested. The same imbalance argument applies to serving
  throughput (pipelining here is a latency-hiding mechanism, not a
  2x): the pipeline exists because a *framework* must have the axis,
  and it is exact where it is sound.

Expert parallelism has no substrate in this model family (no MoE /
expert-routed layers anywhere in the reference or here) — N/A rather
than missing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pointnet_autoencoder_tpu.inference import chunked_dispatch
from pointnet_autoencoder_tpu.models.autoencoder import DECODERS
from pointnet_autoencoder_tpu.nn.encoder import PointNetEncoder
from pointnet_autoencoder_tpu.nn.layers import FC


class _EncoderStage(nn.Module):
    """Encoder + neck, with submodule names matching PointAutoencoder so
    the full model's variable sub-trees apply directly (the same trick
    InferenceSession.decode uses for the decoder stage)."""

    neck: Tuple[int, ...]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, points, train: bool = False, bn_momentum=0.0):
        feat = PointNetEncoder(dtype=self.dtype, name="encoder")(
            points, train, bn_momentum
        )
        for i, width in enumerate(self.neck):
            feat = FC(width, bn=True, dtype=self.dtype, name=f"fc0{i}")(
                feat, train, bn_momentum
            )
        return feat


def _subtree(variables, keys):
    return {
        "params": {k: variables["params"][k] for k in keys
                   if k in variables["params"]},
        "batch_stats": {k: variables.get("batch_stats", {})[k] for k in keys
                        if k in variables.get("batch_stats", {})},
    }


class PipelinedSession:
    """Wraps an InferenceSession's restored model as a 2-stage serving
    pipeline across two devices.

    Args:
      session: an ``InferenceSession`` (its restored variables are split
        into the two stage sub-trees; the session itself is untouched).
      devices: the two devices to pin the stages to; defaults to the
        first two of ``jax.devices()``.
      num_microbatches: microbatches per compiled batch; must divide the
        session's batch_size. Each microbatch's embedding hops stage
        0 -> stage 1 as soon as it is produced.
    """

    def __init__(self, session, devices: Optional[Sequence[jax.Device]] = None,
                 num_microbatches: int = 4):
        model = session._model
        devices = list(devices if devices is not None else jax.devices()[:2])
        if len(devices) != 2:
            raise ValueError(
                f"expected exactly 2 stage devices, got {len(devices)}"
            )
        if session.batch_size % num_microbatches != 0:
            raise ValueError(
                f"num_microbatches={num_microbatches} must divide "
                f"batch_size={session.batch_size}"
            )
        self.num_point = model.num_point
        self.batch_size = session.batch_size
        self.model_name = session.model_name
        self._mb = session.batch_size // num_microbatches
        self._dev0, self._dev1 = devices

        host_vars = jax.device_get(session._variables)
        enc_keys = ["encoder"] + [f"fc0{i}" for i in range(len(model.neck))]
        self._enc_vars = jax.device_put(_subtree(host_vars, enc_keys),
                                        self._dev0)
        self._dec_vars = jax.device_put(
            {"params": host_vars["params"]["decoder"],
             "batch_stats": host_vars.get("batch_stats", {}).get(
                 "decoder", {})},
            self._dev1,
        )

        enc_module = _EncoderStage(neck=model.neck, dtype=model.dtype)
        dec_module = DECODERS[model.decoder](model.num_point,
                                             dtype=model.dtype)

        def enc_fn(variables, pts):
            return enc_module.apply(variables, pts, False, 0.0)

        def dec_fn(variables, feat):
            pred, _extras = dec_module.apply(variables, feat, False, 0.0)
            return pred

        # Stage placement by committed inputs: each program compiles for
        # (and runs on) the device its arguments are committed to.
        self._enc_jit = jax.jit(enc_fn)
        self._dec_jit = jax.jit(dec_fn)

    def _check_points(self, points) -> Tuple[np.ndarray, bool]:
        pts = np.asarray(points, np.float32)
        single = pts.ndim == 2
        if single:
            pts = pts[None]
        if pts.shape[1:] != (self.num_point, 3):
            raise ValueError(
                f"expected (*, {self.num_point}, 3), got {pts.shape}"
            )
        if pts.shape[0] == 0:
            raise ValueError("got 0 input shapes")
        return pts, single

    def _microbatched(self, run, arr: np.ndarray) -> np.ndarray:
        """Stream arr through ``run`` in microbatch chunks; all dispatches
        are async (chunked_dispatch fetches only after the last one), so
        stage 0 of chunk i+1 overlaps stage 1 of chunk i."""
        return chunked_dispatch(run, arr, self._mb)

    def _full_forward(self, chunk: np.ndarray):
        feat = self._enc_jit(self._enc_vars,
                             jax.device_put(chunk, self._dev0))
        feat = jax.device_put(feat, self._dev1)  # the stage hop
        return self._dec_jit(self._dec_vars, feat)

    def reconstruct(self, points) -> np.ndarray:
        """(B, N, 3) or (N, 3) -> reconstruction(s), exactly equal to the
        wrapped session's unpipelined forward."""
        pts, single = self._check_points(points)
        out = self._microbatched(self._full_forward, pts)
        return out[0] if single else out

    def embed(self, points) -> np.ndarray:
        """(B, N, 3) or (N, 3) -> embedding(s): stage 0 alone."""
        pts, single = self._check_points(points)
        out = self._microbatched(
            lambda c: self._enc_jit(self._enc_vars,
                                    jax.device_put(c, self._dev0)), pts)
        return out[0] if single else out

    def decode(self, embeddings) -> np.ndarray:
        """(B, D) or (D,) latent(s) -> decoded cloud(s): stage 1 alone."""
        emb = np.asarray(embeddings, np.float32)
        single = emb.ndim == 1
        if single:
            emb = emb[None]
        if emb.ndim != 2 or emb.shape[0] == 0:
            raise ValueError(f"expected nonempty (B, D) or (D,), "
                             f"got {emb.shape}")
        out = self._microbatched(
            lambda c: self._dec_jit(self._dec_vars,
                                    jax.device_put(c, self._dev1)), emb)
        return out[0] if single else out
