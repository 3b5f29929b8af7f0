from news_image_caption_tpu.ops.linear import GehringLinear, XavierLinear
from news_image_caption_tpu.ops.positional import (
    SinusoidalPositionalEmbedding,
    LearnedPositionalEmbedding,
    make_positions,
    sinusoidal_table,
)
from news_image_caption_tpu.ops.attention import MultiHeadAttention
from news_image_caption_tpu.ops.conv import DynamicConv, LightweightConv
from news_image_caption_tpu.ops.adaptive import AdaptiveEmbedding, AdaptiveSoftmax

__all__ = [
    "GehringLinear",
    "XavierLinear",
    "SinusoidalPositionalEmbedding",
    "LearnedPositionalEmbedding",
    "make_positions",
    "sinusoidal_table",
    "MultiHeadAttention",
    "DynamicConv",
    "LightweightConv",
    "AdaptiveEmbedding",
    "AdaptiveSoftmax",
]
