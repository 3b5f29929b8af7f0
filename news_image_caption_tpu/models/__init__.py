from news_image_caption_tpu.models.decoder_flattened import (
    DynamicConvDecoder, DynamicConvDecoderLayer, SumEmbedder)

__all__ = [
    "DynamicConvDecoder",
    "DynamicConvDecoderLayer",
    "SumEmbedder",
]
