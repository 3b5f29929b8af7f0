from news_image_caption_tpu.data.vocabulary import (
    WordVocab, RobertaSpecialTokens)
from news_image_caption_tpu.data.bpe import ByteBPE
from news_image_caption_tpu.data.collate import (
    collate_captions, make_causal_pad_mask)
from news_image_caption_tpu.data.dataset import SyntheticNewsDataset
from news_image_caption_tpu.data.loader import DeviceLoader

__all__ = [
    "WordVocab",
    "RobertaSpecialTokens",
    "ByteBPE",
    "collate_captions",
    "make_causal_pad_mask",
    "SyntheticNewsDataset",
    "DeviceLoader",
]
