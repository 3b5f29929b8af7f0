from news_image_caption_tpu.generation.generator import (
    GenerationConfig, beam_search, beam_search_candidates, generate,
    generate_candidates, permute_rows)

__all__ = ["GenerationConfig", "beam_search", "beam_search_candidates",
           "generate", "generate_candidates", "permute_rows"]
