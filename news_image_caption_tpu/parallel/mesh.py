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
PIPE_AXIS = "pipe"


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1      # -1: all remaining devices
    model: int = 1
    context: int = 1    # sequence-parallel axis (parallel/ring.py)
    pipe: int = 1       # pipeline-parallel axis (parallel/pipe.py)


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model, context = config.model, config.context
    pipe = config.pipe
    data = (config.data if config.data != -1
            else n // (model * context * pipe))
    if data * model * context * pipe != n:
        raise ValueError(
            f"mesh {data}x{model}x{context}x{pipe} does not cover "
            f"{n} devices")
    # Trailing singleton axes are dropped so existing 2-axis (dp x tp)
    # partition specs keep working; `pipe` is placed innermost — its
    # ppermute activation handoffs are the latency-critical hops and
    # should ride neighboring-chip ICI links.
    shape = [data, model]
    names = [DATA_AXIS, MODEL_AXIS]
    if context > 1:
        shape.append(context)
        names.append(CONTEXT_AXIS)
    if pipe > 1:
        shape.append(pipe)
        names.append(PIPE_AXIS)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(names))
