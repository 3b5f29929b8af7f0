"""Captioning worker process hosting a jitted generate function.

Capability parity target: Worker/CaptioningWorker
(/root/reference/ttl/tell/tasks/base.py:13-85, captioner.py:50-444):
a Process with a PULL job socket, model initialization on startup, and
per-job caption generation pushed to the sink. Per-worker device
pinning (reference: CUDA_VISIBLE_DEVICES, captioner.py:67-75) maps to
per-worker `jax.devices()[worker_id % n]` placement.

The default model here is the flagship captioner over precomputed
features; a production deployment points `model_builder` at a
checkpoint-loading closure (and runs face/object detection offline or
in the same worker, SURVEY.md §7 step 10).
"""

from __future__ import annotations

import multiprocessing
from typing import Any, Callable, Dict, Optional

import numpy as np
import zmq

from news_image_caption_tpu.serving.messages import pack, unpack
from news_image_caption_tpu.utils.logging import setup_logger


def default_model_builder():
    """Tiny random-weight captioner (smoke/serving tests)."""
    import jax

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened

    model = TransformerFlattened(
        vocab_size=64, cutoff=(16, 32, 64), embed_dim=32, ffn_dim=64,
        num_heads=4, num_layers=2, kernel_sizes=(3, 5), image_dim=16,
        article_dim=24, max_positions=64)
    import jax.numpy as jnp
    B = 1
    batch = {
        "caption_ids": jnp.zeros((B, 8), jnp.int32),
        "image": jnp.zeros((B, 4, 16)),
        "image_mask": jnp.zeros((B, 4), bool),
        "article": jnp.zeros((B, 6, 24)),
        "article_mask": jnp.zeros((B, 6), bool),
    }
    params = model.init(jax.random.PRNGKey(0), batch)
    cfg = GenerationConfig(max_len=16)
    gen = jax.jit(lambda b: model.generate(params, b, cfg)[0])

    def predict(job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        b = {
            "image": jnp.asarray(job["image"]),
            "image_mask": jnp.asarray(job["image_mask"]),
            "article": jnp.asarray(job["article"]),
            "article_mask": jnp.asarray(job["article_mask"]),
        }
        tokens = np.asarray(gen(b))
        return {"tokens": tokens}

    return predict


_MP = multiprocessing.get_context("spawn")


class CaptioningWorker(_MP.Process):
    """platform: force a JAX backend in the worker ('cpu' for tests,
    None = environment default = TPU). Only one process may own the
    TPU; multi-worker TPU serving pins one worker per chip
    (reference analog: per-worker CUDA_VISIBLE_DEVICES,
    captioner.py:67-75)."""

    def __init__(self, worker_id: int, receive_addr: str, sink_addr: str,
                 model_builder: Optional[Callable] = None,
                 platform: Optional[str] = None):
        super().__init__()
        self.worker_id = worker_id
        self.receive_addr = receive_addr
        self.sink_addr = sink_addr
        self.model_builder = model_builder or default_model_builder
        self.platform = platform
        self.daemon = True

    def run(self):
        logger = setup_logger(f"worker-{self.worker_id}")
        if self.platform is not None:
            import jax
            jax.config.update("jax_platforms", self.platform)
        predict = self.model_builder()
        ctx = zmq.Context()
        receiver = ctx.socket(zmq.PULL)
        receiver.connect(self.receive_addr)
        sink = ctx.socket(zmq.PUSH)
        sink.connect(self.sink_addr)
        logger.info("worker %d ready", self.worker_id)
        try:
            while True:
                frames = receiver.recv_multipart()
                client_id, job_id = frames[0], frames[1]
                job = unpack(frames[2:])
                try:
                    result = predict(job)
                except Exception as e:  # report errors to the client
                    result = {"error": repr(e)}
                sink.send_multipart(
                    [client_id, job_id] + pack(result))
        finally:
            receiver.close()
            sink.close()
            ctx.term()
