"""Model registry: ``--model`` flag strings -> ModelSpec.

Names (including the reference's 'model_hierachy' spelling) match the
reference's dynamic module-import convention (train.py:48) so CLI
invocations are drop-in compatible. 'model' vs 'model_cpu' differ only in
which Chamfer implementation backs the loss, mirroring the reference's
custom-op vs pure-TF pair (models/model.py vs models/model_cpu.py).
"""

from __future__ import annotations

from typing import Dict

from pointnet_autoencoder_tpu.models.autoencoder import (
    ModelSpec,
    chamfer_x100_loss,
    emd_loss_fn,
    hierarchy_loss_fn,
)

_REGISTRY: Dict[str, ModelSpec] = {}


def _register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    return spec


_register(ModelSpec(
    name="model", decoder="fc", neck=(),
    loss_fn=chamfer_x100_loss(),  # auto impl: Pallas kernel on TPU
))
_register(ModelSpec(
    name="model_cpu", decoder="fc", neck=(),
    loss_fn=chamfer_x100_loss(chamfer_impl="xla"),  # dense fallback path
))
_register(ModelSpec(
    name="model_emd", decoder="fc", neck=(),
    loss_fn=emd_loss_fn,
))
_register(ModelSpec(
    name="model_upconv", decoder="upconv", neck=(1024,),
    loss_fn=chamfer_x100_loss(),
    point_constraint=lambda n: n == 2048,
    constraint_msg="upconv decoder emits exactly 2048 points",
))
_register(ModelSpec(
    name="model_fc_upconv", decoder="fc_upconv", neck=(512,),
    loss_fn=chamfer_x100_loss(),
    point_constraint=lambda n: n == 2048,
    constraint_msg="fc_upconv decoder emits exactly 2048 points",
))
_register(ModelSpec(
    name="model_hierachy", decoder="hierarchy", neck=(512, 512),
    loss_fn=hierarchy_loss_fn,
    point_constraint=lambda n: n % 64 == 0,
    constraint_msg="hierarchical decoder needs num_point divisible by 64",
))


def get_model_spec(name: str) -> ModelSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_models():
    return sorted(_REGISTRY)
