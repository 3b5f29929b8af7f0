from news_image_caption_tpu.models.decoder_flattened import (
    DynamicConvDecoder, DynamicConvDecoderLayer, SumEmbedder)
from news_image_caption_tpu.models.captioner import TransformerFlattened
from news_image_caption_tpu.models.gen1 import Gen1Captioner, Gen1Model
from news_image_caption_tpu.models.gen2 import Gen2Captioner, Gen2Transformer
from news_image_caption_tpu.models.pipeline import Gen3Pipeline
from news_image_caption_tpu.models.pointer import TransformerPointer
from news_image_caption_tpu.models import variants  # noqa: F401
from news_image_caption_tpu.models import tgnc  # noqa: F401
from news_image_caption_tpu.models.decoder_lstm import (  # noqa: F401
    LSTMDecoder, LSTMFlattenedModel)
from news_image_caption_tpu.models.resnet import ResNetTrunk
from news_image_caption_tpu.models.roberta import RobertaEncoder

__all__ = [
    "DynamicConvDecoder",
    "DynamicConvDecoderLayer",
    "SumEmbedder",
    "TransformerFlattened",
    "Gen1Captioner",
    "Gen1Model",
    "Gen2Captioner",
    "Gen2Transformer",
    "Gen3Pipeline",
    "TransformerPointer",
    "ResNetTrunk",
    "RobertaEncoder",
]
