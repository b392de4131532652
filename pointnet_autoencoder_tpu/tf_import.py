"""Import a reference TF-1.x training checkpoint into this framework.

The reference trains with ``tf.train.Saver`` (train.py:124,162,167); its
checkpoints hold flat variable-scope names (``conv1/weights``,
``fc1/bn/moving_mean``, ...) created by utils/tf_util.py. This module maps
those variables onto this framework's flax tree so a model trained on the
reference stack can be served (or fine-tuned) here without retraining:

    python -m pointnet_autoencoder_tpu.cli.import_tf \\
        --model model --tf_checkpoint log/model.ckpt --num_point 2048 \\
        --out serving/imported

Name mapping (reference scope -> flax path), derived from the reference
model files (models/model.py:43-73 and siblings -- every family shares the
encoder scopes conv1..conv5):

    convN/*            -> params/encoder/convN/*       (shared encoder)
    fc00/*, fc01/*     -> params/fc00/*, fc01/*        (neck FCs)
    everything else    -> params/decoder/<scope>/*     (family decoders)

with per-variable transforms:

    weights (kh,kw,cin,cout) conv2d   -> dense/kernel (kh*kw*cin, cout)
        (the reference's [1,1]/[1,3] "convs" ARE per-point dense layers;
         tf.nn.conv2d flattens patches (kh,kw,cin)-major, so the reshape
         preserves the contraction order -- utils/tf_util.py:120-166)
    weights (k,cin,cout) conv1d       -> dense/kernel (k*cin, cout)
    weights (in,out) fully_connected  -> dense/kernel as-is
    weights (kh,kw,cout,cin) conv2d_transpose
        -> convt/kernel (kh,kw,cin,cout), channel axes swapped AND both
           spatial axes flipped: tf.nn.conv2d_transpose is the gradient of
           conv2d (kernel layout utils/tf_util.py:227-229), while flax's
           ConvTranspose convolves the un-flipped kernel over the dilated
           input. Verified exact (0.0 error) against tf.nn.conv2d_transpose
           for the upconv stage geometries.
    biases                            -> dense|convt /bias
    bn/beta, bn/gamma                 -> params .../bn/{beta,gamma}
    bn/moving_mean, bn/moving_variance-> batch_stats .../bn/{mean,var}
        (tf.contrib.layers.batch_norm with scope='bn',
         utils/tf_util.py:527-533; a bare 'BatchNorm' sub-scope -- contrib's
         default when no scope is passed -- is accepted as a fallback)

Optimizer slot variables (``*/Adam``, ``*/Adam_1``, ``*/Momentum``,
``beta1_power``, ``beta2_power``) and the global step (``batch``,
train.py:101) are recognized and skipped: the import produces a params-only
serving bundle (see cli/export.py), loadable with
``InferenceSession.from_bundle`` or ``cli.test --model_path <bundle>``.

Readers: a real TF checkpoint needs tensorflow (``tf.train.load_checkpoint``
reads both V1 and V2 Saver formats); a ``.npz`` archive with the same
variable names works without TF (scope slashes may be encoded as ``__``
since ``/`` is awkward in npz keys).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, List, Tuple

import jax
import numpy as np

_BUNDLE_META = "bundle_meta.json"

# Optimizer/bookkeeping variables a reference training checkpoint contains
# beyond the model (tf.train.AdamOptimizer / MomentumOptimizer slots and the
# global-step variable 'batch', train.py:101,117-120).
_SKIP_EXACT = {"batch", "beta1_power", "beta2_power", "global_step"}
_SKIP_SUFFIX = ("/Adam", "/Adam_1", "/Momentum")


class TFImportError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Checkpoint readers
# ---------------------------------------------------------------------------


def _npz_reader(path: str) -> Tuple[Callable[[str], np.ndarray], List[str]]:
    data = np.load(path)
    # Allow '__'-encoded slashes (npz keys with '/' are legal but awkward
    # to produce from some tools).
    table = {k.replace("__", "/"): k for k in data.files}
    return (lambda name: np.asarray(data[table[name]])), sorted(table)


def _tf_reader(path: str) -> Tuple[Callable[[str], np.ndarray], List[str]]:
    try:
        import tensorflow as tf  # noqa: F811
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise TFImportError(
            "reading a TF checkpoint requires tensorflow; either install "
            "it or convert the checkpoint to .npz (numpy archive keyed by "
            "variable name) and pass that instead"
        ) from e
    reader = tf.train.load_checkpoint(path)
    names = sorted(reader.get_variable_to_shape_map())
    return (lambda name: np.asarray(reader.get_tensor(name))), names


def open_checkpoint(path: str):
    """Returns (get_tensor(name) -> np.ndarray, [variable names])."""
    if path.endswith(".npz"):
        return _npz_reader(path)
    return _tf_reader(path)


# ---------------------------------------------------------------------------
# Variable transforms
# ---------------------------------------------------------------------------


def _dense_kernel(w: np.ndarray, want_shape) -> np.ndarray:
    """conv2d (kh,kw,cin,cout) / conv1d (k,cin,cout) / fc (in,out) weights
    -> dense kernel (in_features, out_features)."""
    if w.ndim > 2:
        w = w.reshape(-1, w.shape[-1])
    if w.shape != tuple(want_shape):
        raise TFImportError(
            f"dense kernel shape {w.shape} != expected {tuple(want_shape)}"
        )
    return w


def _convt_kernel(w: np.ndarray, want_shape) -> np.ndarray:
    """conv2d_transpose weights (kh,kw,cout,cin) -> flax ConvTranspose
    kernel (kh,kw,cin,cout): swap channel axes, flip both spatial axes."""
    if w.ndim != 4:
        raise TFImportError(f"conv2d_transpose kernel must be 4-D, got {w.shape}")
    w = np.ascontiguousarray(np.transpose(w, (0, 1, 3, 2))[::-1, ::-1])
    if w.shape != tuple(want_shape):
        raise TFImportError(
            f"convt kernel shape {w.shape} != expected {tuple(want_shape)}"
        )
    return w


def _plain(w: np.ndarray, want_shape) -> np.ndarray:
    if w.shape != tuple(want_shape):
        raise TFImportError(f"shape {w.shape} != expected {tuple(want_shape)}")
    return w


# ---------------------------------------------------------------------------
# Tree mapping
# ---------------------------------------------------------------------------


def _ref_scope(flax_path: Tuple[str, ...]) -> str:
    """Top-level flax module name -> reference variable scope."""
    head = flax_path[0]
    if head == "encoder":
        return flax_path[1]  # conv1..conv5
    if head == "decoder":
        return flax_path[1]  # fc1, upconv3, fc_conv1, ...
    return head  # neck fc00/fc01


def _lookup(get, names_set, candidates: List[str]) -> Tuple[str, np.ndarray]:
    for name in candidates:
        if name in names_set:
            return name, get(name)
    raise TFImportError(
        f"checkpoint has none of {candidates}; available names nearby: "
        + ", ".join(n for n in sorted(names_set)
                    if n.startswith(candidates[0].split('/')[0]))[:400]
    )


def map_reference_variables(variables, get, names: List[str]):
    """Fill this framework's {params, batch_stats} tree from a reference
    checkpoint reader. Returns (filled_tree, used_names, skipped_names)."""
    names_set = set(names)
    used: List[str] = []

    params_flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]:
        keys = tuple(k.key for k in path)
        params_flat[keys] = leaf
    stats_flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables.get("batch_stats", {}))[0]:
        keys = tuple(k.key for k in path)
        stats_flat[keys] = leaf

    def fetch(scope: str, var: str, bn: bool = False):
        if bn:
            # contrib.layers.batch_norm(scope='bn') -> <scope>/bn/<var>;
            # 'BatchNorm' is contrib's default sub-scope, accepted in case
            # a fork dropped the explicit scope.
            cands = [f"{scope}/bn/{var}", f"{scope}/bn/BatchNorm/{var}",
                     f"{scope}/BatchNorm/{var}"]
        else:
            cands = [f"{scope}/{var}"]
        name, value = _lookup(get, names_set, cands)
        used.append(name)
        return value

    new_params = {}
    for keys, leaf in params_flat.items():
        scope = _ref_scope(keys)
        kind, var = keys[-2], keys[-1]
        try:
            if kind == "dense" and var == "kernel":
                value = _dense_kernel(fetch(scope, "weights"), leaf.shape)
            elif kind == "convt" and var == "kernel":
                value = _convt_kernel(fetch(scope, "weights"), leaf.shape)
            elif var == "bias":
                value = _plain(fetch(scope, "biases"), leaf.shape)
            elif kind == "bn" and var == "beta":
                value = _plain(fetch(scope, "beta", bn=True), leaf.shape)
            elif kind == "bn" and var == "gamma":
                value = _plain(fetch(scope, "gamma", bn=True), leaf.shape)
            else:
                raise TFImportError(f"no mapping rule for leaf kind {keys[-2:]}")
        except TFImportError as e:
            raise TFImportError(f"at {'/'.join(keys)}: {e}") from None
        new_params[keys] = np.asarray(value, np.float32)

    new_stats = {}
    for keys, leaf in stats_flat.items():
        scope = _ref_scope(keys)
        var = {"mean": "moving_mean", "var": "moving_variance"}[keys[-1]]
        try:
            value = _plain(fetch(scope, var, bn=True), leaf.shape)
        except TFImportError as e:
            raise TFImportError(f"at {'/'.join(keys)}: {e}") from None
        new_stats[keys] = np.asarray(value, np.float32)

    skipped = sorted(names_set - set(used))

    def rebuild(template, flat):
        # Rebuild nested dicts from the flat path map.
        result: Dict = {}
        for keys, value in flat.items():
            d = result
            for k in keys[:-1]:
                d = d.setdefault(k, {})
            d[keys[-1]] = value
        return result

    tree = {"params": rebuild(variables["params"], new_params)}
    if stats_flat:
        tree["batch_stats"] = rebuild(
            variables.get("batch_stats", {}), new_stats)
    else:
        tree["batch_stats"] = {}
    return tree, used, skipped


def classify_skipped(skipped: List[str]) -> Tuple[List[str], List[str]]:
    """Split skipped checkpoint names into (expected optimizer/bookkeeping,
    genuinely unrecognized)."""
    expected, unknown = [], []
    for name in skipped:
        if name in _SKIP_EXACT or name.endswith(_SKIP_SUFFIX) or re.search(
                r"/(Adam|Adam_1|Momentum)(/|$)", name):
            expected.append(name)
        else:
            unknown.append(name)
    return expected, unknown


# ---------------------------------------------------------------------------
# Reverse direction: flax tree -> reference-named arrays
# ---------------------------------------------------------------------------


def export_reference_arrays(variables) -> Dict[str, np.ndarray]:
    """Inverse of :func:`map_reference_variables`: emit this framework's
    {params, batch_stats} tree as a flat dict keyed by the REFERENCE
    stack's variable names (conv2d weights restored to their 4-D pseudo-
    image layout, conv2d_transpose kernels flipped/swapped back, BN
    moving stats as moving_mean/moving_variance).

    Uses pointwise (1,1,cin,cout) conv kernels except conv1, whose
    reference kernel is (1,3,1,cout) over the (B,N,3,1) pseudo-image
    (models/model.py:43-47); both flatten back identically, so the
    round trip import(export(tree)) == tree exactly. Save with
    ``np.savez(path, **arrays)`` for cli.import_tf's npz reader (or feed
    a TF Saver to produce a reference-stack checkpoint)."""
    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables["params"])[0]:
        keys = tuple(k.key for k in path)
        scope = _ref_scope(keys)
        kind, var = keys[-2], keys[-1]
        arr = np.asarray(leaf, np.float32)
        if kind == "dense" and var == "kernel":
            cin, cout = arr.shape
            if keys[:2] == ("encoder", "conv1"):
                out[f"{scope}/weights"] = arr.reshape(1, cin, 1, cout)
            elif keys[0] == "encoder":
                out[f"{scope}/weights"] = arr.reshape(1, 1, cin, cout)
            elif scope.startswith("fc_conv"):  # hierarchy conv1d stages
                out[f"{scope}/weights"] = arr.reshape(1, cin, cout)
            else:
                out[f"{scope}/weights"] = arr
        elif kind == "convt" and var == "kernel":
            # (kh, kw, cin, cout) -> reference (kh, kw, cout, cin)
            out[f"{scope}/weights"] = np.ascontiguousarray(
                np.transpose(arr[::-1, ::-1], (0, 1, 3, 2)))
        elif var == "bias":
            out[f"{scope}/biases"] = arr
        elif kind == "bn" and var in ("beta", "gamma"):
            out[f"{scope}/bn/{var}"] = arr
        else:
            raise TFImportError(f"no export rule for leaf {keys}")
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables.get("batch_stats", {}))[0]:
        keys = tuple(k.key for k in path)
        scope = _ref_scope(keys)
        name = {"mean": "moving_mean", "var": "moving_variance"}[keys[-1]]
        out[f"{scope}/bn/{name}"] = np.asarray(leaf, np.float32)
    return out


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def import_reference_checkpoint(model: str, tf_checkpoint: str,
                                num_point: int, out_dir: str | None = None,
                                strict: bool = True):
    """Map a reference checkpoint onto ``model``'s variable tree; optionally
    write a serving bundle at ``out_dir``. Returns (variables, report dict).

    strict: raise if the checkpoint contains variables that are neither
    model variables nor recognizable optimizer state (catches importing the
    wrong --model family against a checkpoint)."""
    from pointnet_autoencoder_tpu.models.registry import get_model_spec

    spec = get_model_spec(model)
    _, variables = spec.init_variables(jax.random.PRNGKey(0), num_point)
    get, names = open_checkpoint(tf_checkpoint)
    tree, used, skipped = map_reference_variables(variables, get, names)
    expected_skips, unknown = classify_skipped(skipped)
    if unknown and strict:
        raise TFImportError(
            "checkpoint variables with no mapping (wrong --model family, "
            "or a fork with extra layers?): " + ", ".join(unknown[:20])
        )
    report = {
        "model": model,
        "num_point": num_point,
        "mapped": len(used),
        "skipped_optimizer_state": len(expected_skips),
        "unmapped": unknown,
    }
    if out_dir is not None:
        from pointnet_autoencoder_tpu.train.checkpoint import CheckpointManager

        out_dir = os.path.abspath(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        mgr = CheckpointManager(os.path.dirname(out_dir) or ".")
        mgr.save_tree(os.path.join(out_dir, "variables.ckpt"),
                      jax.tree_util.tree_map(np.asarray, tree))
        with open(os.path.join(out_dir, _BUNDLE_META), "w") as f:
            json.dump({"format": "pcae-bundle-v1", "model": model,
                       "num_point": num_point,
                       "imported_from": os.path.abspath(tf_checkpoint)}, f)
        report["bundle"] = out_dir
    return tree, report
