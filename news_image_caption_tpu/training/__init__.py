from news_image_caption_tpu.training.checkpoint import CheckpointStore
from news_image_caption_tpu.training.optim import (
    bert_adam, noam_schedule, warmup_linear_schedule, make_bert_adam)
from news_image_caption_tpu.training.preemption import PreemptionHandler
from news_image_caption_tpu.training.train_step import (
    TrainState, make_train_step, make_eval_step)

__all__ = [
    "bert_adam",
    "noam_schedule",
    "warmup_linear_schedule",
    "make_bert_adam",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "CheckpointStore",
    "PreemptionHandler",
]
