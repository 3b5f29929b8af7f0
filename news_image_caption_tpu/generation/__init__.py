from news_image_caption_tpu.generation.generator import (
    GenerationConfig, beam_search, beam_search_candidates, generate,
    generate_candidates, permute_rows)
from news_image_caption_tpu.generation.continuous import (
    ContinuousBatcher, SlotState)
from news_image_caption_tpu.generation.speculative import (
    commit_conv_caches, ngram_drafts, speculative_greedy)

__all__ = ["GenerationConfig", "beam_search", "beam_search_candidates",
           "generate", "generate_candidates", "permute_rows",
           "commit_conv_caches", "ngram_drafts", "speculative_greedy",
           "ContinuousBatcher", "SlotState"]
