"""news_image_caption_tpu — a TPU-native news-image-captioning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
harsh157/news_image_caption (three generations of news captioners:
LSTM/attention captioners, transformer decoders over ResNet patches +
article embeddings, and the Transform-and-Tell dynamic-convolution
family), built TPU-first:

- batch-first tensors, static shapes, `lax.scan` decoding
- `jax.sharding.Mesh` + NamedSharding for data/tensor parallelism
- bf16 mixed precision via a simple policy (no loss scaling needed)
- Pallas kernels for the hot ops (dynamic conv band matmul)
- functional decode caches (explicit pytrees, no mutable module state)
"""

__version__ = "0.1.0"

from news_image_caption_tpu.utils.registry import Registry  # noqa: F401
