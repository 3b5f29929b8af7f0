from news_image_caption_tpu.generation.generator import (
    GenerationConfig, generate, beam_search)

__all__ = ["GenerationConfig", "generate", "beam_search"]
