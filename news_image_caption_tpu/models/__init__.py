from news_image_caption_tpu.models.decoder_flattened import (
    DynamicConvDecoder, DynamicConvDecoderLayer, SumEmbedder)
from news_image_caption_tpu.models.captioner import TransformerFlattened

__all__ = [
    "DynamicConvDecoder",
    "DynamicConvDecoderLayer",
    "SumEmbedder",
    "TransformerFlattened",
]
