from news_image_caption_tpu.parallel.distributed import (
    device_put_global, initialize, shard_iterator)
from news_image_caption_tpu.parallel.mesh import make_mesh, MeshConfig
from news_image_caption_tpu.parallel.partition import (
    param_shardings, batch_shardings, shard_params)
from news_image_caption_tpu.parallel.pipe import (pipeline_apply,
                                                  stack_layers)
from news_image_caption_tpu.parallel.ring import ring_attention

__all__ = [
    "ring_attention",
    "pipeline_apply",
    "stack_layers",
    "make_mesh",
    "MeshConfig",
    "param_shardings",
    "batch_shardings",
    "shard_params",
    "initialize",
    "shard_iterator",
    "device_put_global",
]
