"""Device mesh construction for data/tensor parallelism.

The reference's only parallelism is single-node torch DataParallel
(/root/reference/ttl/tell/training/callback_apex_trainer.py:187-189);
the TPU-native replacement is an explicit `jax.sharding.Mesh` with a
`data` axis (batch sharding, gradients psum over ICI) and an optional
`model` axis (tensor parallelism over attention heads / FFN / adaptive
softmax bands). See SURVEY.md §2.10.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
CONTEXT_AXIS = "context"


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1      # -1: all remaining devices
    model: int = 1
    context: int = 1    # sequence-parallel axis (extension point)


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model, context = config.model, config.context
    data = (config.data if config.data != -1
            else n // (model * context))
    if data * model * context != n:
        raise ValueError(
            f"mesh {data}x{model}x{context} does not cover {n} devices")
    if context == 1:
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, model, context)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, CONTEXT_AXIS))
