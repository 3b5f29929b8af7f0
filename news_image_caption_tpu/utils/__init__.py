from news_image_caption_tpu.utils.registry import Registry
from news_image_caption_tpu.utils.logging import setup_logger

__all__ = ["Registry", "setup_logger"]
