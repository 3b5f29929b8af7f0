from news_image_caption_tpu.serving.base import CaptionServer, ServerCmd
from news_image_caption_tpu.serving.client import CaptioningClient
from news_image_caption_tpu.serving.worker import CaptioningWorker

__all__ = ["CaptionServer", "ServerCmd", "CaptioningClient",
           "CaptioningWorker"]
