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


def default_model_builder(speculative_k: int = 0,
                          continuous_slots: int = 0,
                          inner_steps: int = 8,
                          harvest_lag: int = 1,
                          continuous_beam: bool = False,
                          sampling_topk: int = 1,
                          sampling_temp: float = 1.0):
    """Tiny random-weight captioner (smoke/serving tests).

    speculative_k >= 2 enables the same exact speculative-greedy
    routing as the flagship builder (jobs with `article_ids` use it,
    others fall back) so the serving contract is testable on CPU.
    continuous_slots > 0 attaches a ContinuousBatcher engine (the
    worker switches to its slot-refill loop) so that serving mode is
    CPU-testable too. sampling_topk > 1 serves top-k sampled captions
    from the slot pool (per-request rng via the job's `rng_seed`).
    """
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
    _check_sampling_args(sampling_topk, continuous_slots,
                         continuous_beam, speculative_k)
    cfg = GenerationConfig(max_len=16, sampling_topk=sampling_topk,
                           sampling_temp=sampling_temp)
    gen = jax.jit(lambda b: model.generate(params, b, cfg)[0])
    spec_gen = None
    if speculative_k >= 2:
        spec_gen = jax.jit(lambda b: model.generate_speculative(
            params, b, cfg, spec_k=speculative_k)[0])

    def stage(job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # Same ingest-thread staging hook as the flagship builder
        # (idempotent: jnp.asarray of staged arrays is a no-op), so
        # the worker's pipelined staging branch is CPU-testable.
        b = {
            "image": jnp.asarray(job["image"]),
            "image_mask": jnp.asarray(job["image_mask"]),
            "article": jnp.asarray(job["article"]),
            "article_mask": jnp.asarray(job["article_mask"]),
        }
        if spec_gen is not None and "article_ids" in job:
            ids = job["article_ids"]
            if ids.shape[1] != 6:        # keep the compiled shape
                ids = _fit_ids(ids, 6)
            b["article_ids"] = jnp.asarray(ids, jnp.int32)
        if "max_len" in job:   # per-request cap (continuous engine)
            b["max_len"] = int(np.asarray(job["max_len"]).ravel()[0])
        if "rng_seed" in job:  # per-request PRNG (sampling slots)
            b["rng_seed"] = int(np.asarray(job["rng_seed"]).ravel()[0])
        return b

    def predict(job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        b = stage(job)
        if b.pop("max_len", None) is not None:
            # honor-or-reject: the plain path decodes the full
            # config max_len; silently ignoring the cap would lie.
            raise ValueError("per-request max_len requires a "
                             "--continuous-slots worker")
        if b.pop("rng_seed", None) is not None:
            raise ValueError("per-request rng_seed requires a "
                             "--sampling-topk --continuous-slots "
                             "worker")
        if spec_gen is not None and "article_ids" in b:
            return {"tokens": np.asarray(spec_gen(b))}
        return {"tokens": np.asarray(gen(b))}

    def warmup():
        # Compile before signalling ready: the first REAL job must not
        # pay the jit (measured 2.7 s p99 without this —
        # benchmarks/serving_bench.py).
        base = {k: np.asarray(v) for k, v in batch.items()
                if k != "caption_ids"}
        predict(base)
        if spec_gen is not None:
            base["article_ids"] = np.ones((B, 6), np.int32)
            predict(base)

    predict.warmup = warmup
    predict.stage = stage
    if continuous_beam and continuous_slots <= 0:
        raise ValueError("continuous_beam requires continuous_slots "
                         "> 0 (a plain worker would silently serve "
                         "greedy payloads)")
    if continuous_slots > 0:
        _attach_continuous(predict, model, params, cfg,
                           continuous_slots, inner_steps,
                           speculative_k, source_len=6,
                           dummy={k: v for k, v in batch.items()
                                  if k != "caption_ids"},
                           beam=continuous_beam,
                           harvest_lag=harvest_lag)
    return predict


def _check_sampling_args(sampling_topk: int, continuous_slots: int,
                         continuous_beam: bool,
                         speculative_k: int) -> None:
    """Serving-mode validation for top-k sampling: it is served from
    the slot pool only (per-slot PRNG chains replicate generate's B=1
    key schedule); the plain/beam/speculative paths would silently
    serve something other than what the client asked for."""
    if sampling_topk <= 1:
        return
    if continuous_slots <= 0:
        raise ValueError("sampling_topk > 1 requires continuous_slots "
                         "> 0 (sampling is served from the slot pool)")
    if continuous_beam:
        raise ValueError("sampling_topk > 1 excludes continuous_beam")
    if speculative_k >= 2:
        raise ValueError("sampling_topk > 1 excludes speculative_k "
                         "(the draft-verify commit rule is greedy)")


def _attach_continuous(predict, model, params, cfg, n_slots: int,
                       inner_steps: int, speculative_k: int,
                       source_len: int, dummy: Dict[str, Any],
                       beam: bool = False,
                       harvest_lag: int = 1) -> None:
    """Attach a ContinuousBatcher engine + engine-aware warmup to a
    builder's predict fn. The worker detects `predict.engine` and
    switches to the slot-refill loop (submit jobs as they arrive,
    harvest finished captions between chunk dispatches) instead of
    the one-job-at-a-time predict loop. beam=True serves EXACT beam
    search from the slot pool (ContinuousBeamBatcher; results carry
    [beam, L+1] tokens + scores; speculative drafts are greedy-only
    and ignored)."""
    from news_image_caption_tpu.generation.continuous import (
        ContinuousBatcher, ContinuousBeamBatcher)

    if beam:
        engine = ContinuousBeamBatcher(model, params, cfg,
                                       n_slots=n_slots,
                                       inner_steps=inner_steps,
                                       harvest_lag=harvest_lag)
    else:
        engine = ContinuousBatcher.for_flattened(
            model, params, cfg, n_slots=n_slots,
            inner_steps=inner_steps, spec_k=max(1, speculative_k),
            source_len=source_len, harvest_lag=harvest_lag)
    stage = predict.stage

    def warmup():
        # Compile ONLY the engine's prep/insert/chunk kernels before
        # the ready signal — the plain gen/spec_gen paths are dead
        # code in continuous mode and their jits are minutes each on
        # the remote-compile path. Stage the dummy so prep compiles
        # against PRODUCTION dtypes (the flagship stages features to
        # bf16; an fp32 warmup would leave the first real job paying
        # a re-jit).
        wjob = stage({k: np.asarray(v) for k, v in dummy.items()})
        wjob.pop("max_len", None)
        engine.submit(wjob)
        engine.run()
        engine.n_chunks = 0
        if hasattr(engine, "n_committed"):
            engine.n_committed = engine.n_slot_steps = 0

    predict.engine = engine
    predict.warmup = warmup


def _fit_ids(ids, S: int, pad_id: int = 1):
    """Right-pad or trim article_ids to length S (host-side).

    The speculative path is pre-compiled for [B, S]; any other length
    would re-jit on the hot request path (minutes on the
    remote-compile path). Features are already served at S, so ids
    beyond S have no aligned features anyway.
    """
    ids = np.asarray(ids)
    if ids.shape[1] == S:
        return ids
    if ids.shape[1] > S:
        return ids[:, :S]
    out = np.full((ids.shape[0], S), pad_id, ids.dtype)
    out[:, :ids.shape[1]] = ids
    return out


def unflatten_params(flat: Dict[str, Any]):
    """'/'-joined flat keys -> nested param pytree (the .npz layout
    `flagship_model_builder(params_path=...)` loads; produce one with
    np.savez(path, **{'/'.join(path): leaf}).

    np.savez has no bfloat16: ml_dtypes arrays round-trip as raw void
    bytes (V2), which this reverses — an exported bf16_o2 checkpoint
    loads without the producer having to upcast."""
    import ml_dtypes
    import numpy as _np
    params: Dict[str, Any] = {}
    for k, v in flat.items():
        if isinstance(v, _np.ndarray) and v.dtype == _np.dtype("V2"):
            v = v.view(ml_dtypes.bfloat16)
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return params


def flagship_model_builder(max_len: int = 32,
                           early_exit: bool = True,
                           quantize_kv: bool = False,
                           quantize_head: bool = False,
                           params_path: Optional[str] = None,
                           batch_size: int = 1,
                           speculative_k: int = 0,
                           continuous_slots: int = 0,
                           inner_steps: int = 8,
                           harvest_lag: int = 1,
                           continuous_beam: bool = False,
                           sampling_topk: int = 1,
                           sampling_temp: float = 1.0):
    """Production serving builder: the FLAGSHIP captioner at the
    reference's serving shapes (article 512×1024, image 49×2048,
    tasks/captioner.py:79-144), bf16 end-to-end, greedy decode with
    early exit. Serving knobs (documented tradeoffs):

    - quantize_kv: int8 context K/V (~0.5% RMS; +~20% captions/s at
      batch decode — BASELINE.md);
    - quantize_head: int8 adaptive-softmax word tables (~0.4% RMS
      logit error; halves the head-table stream);
    both approximate — captions can differ from exact bf16 decoding
    near ties, so they are off by default.
    - speculative_k: >= 2 enables exact speculative greedy decode
      (generation/speculative.py) for jobs that ship `article_ids`
      [B, S] int32 alongside the features — tokens identical to
      plain greedy, wall-clock shrinks with draft acceptance. Jobs
      without article_ids fall back to the plain path (both paths
      are pre-compiled in warmup). Measured guidance (BASELINE.md
      span-structure curve): spec_k=4 for prompt-lookup drafts at
      news-like caption structure (1.35-1.45x); larger k only pays
      when drafts approach oracle quality (draft-model territory).
    - continuous_slots: > 0 switches the worker to CONTINUOUS
      BATCHING (generation/continuous.py): a pool of that many decode
      slots refilled mid-flight, so one long caption never stalls the
      others and throughput tracks offered load. Jobs must be single
      requests (B=1); composes with speculative_k (per-slot drafts).
      inner_steps = decode steps per device dispatch (host harvests
      finished slots between dispatches).

    params_path: .npz of flattened params ('/'-joined keys, e.g. from
    `np.savez(path, **flatten(port_checkpoint(...)))`); random init
    otherwise (latency benches / smoke).
    """
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened

    model = TransformerFlattened(
        vocab_size=50265, cutoff=(5000, 20000, 50265), embed_dim=1024,
        ffn_dim=4096, num_heads=16, num_layers=4,
        kernel_sizes=(3, 7, 15, 31), image_dim=2048,
        article_dim=1024, max_positions=512, dtype=jnp.bfloat16)
    # batch_size: the request batch the worker pre-compiles for. A
    # job with a different leading dim would re-jit (minutes on the
    # remote-compile path), so deployments fix the request batch and
    # clients pad to it (reference analog: BasicIterator batching in
    # tasks/captioner.py).
    B, P, S = batch_size, 49, 512
    batch = {
        "caption_ids": jnp.zeros((B, 8), jnp.int32),
        "image": jnp.zeros((B, P, 2048), jnp.bfloat16),
        "image_mask": jnp.zeros((B, P), bool),
        "article": jnp.zeros((B, S, 1024), jnp.bfloat16),
        "article_mask": jnp.zeros((B, S), bool),
    }
    if params_path is not None:
        import numpy as _np
        params = jax.tree.map(jnp.asarray,
                              unflatten_params(dict(_np.load(
                                  params_path))))
    else:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    _check_sampling_args(sampling_topk, continuous_slots,
                         continuous_beam, speculative_k)
    cfg = GenerationConfig(max_len=max_len, sampling_topk=sampling_topk,
                           sampling_temp=sampling_temp,
                           early_exit=early_exit,
                           quantize_kv=quantize_kv,
                           quantize_head=quantize_head)
    # Params must be jit ARGUMENTS, not closure constants: closed-over
    # flagship weights (~450 MB) embed into the HLO as literals and
    # overwhelm the remote-compile path.
    gen = jax.jit(lambda p, b: model.generate(p, b, cfg)[0])
    spec_gen = None
    if speculative_k >= 2:
        spec_gen = jax.jit(
            lambda p, b: model.generate_speculative(
                p, b, cfg, spec_k=speculative_k)[0])

    def stage(job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # Host->device transfer, run by the worker's ingest thread so
        # it overlaps the previous job's decode (device_put is async;
        # jnp.asarray below is then a no-op on the staged arrays).
        staged = {
            "image": jnp.asarray(job["image"], jnp.bfloat16),
            "image_mask": jnp.asarray(job["image_mask"]),
            "article": jnp.asarray(job["article"], jnp.bfloat16),
            "article_mask": jnp.asarray(job["article_mask"]),
        }
        if spec_gen is not None and "article_ids" in job:
            ids = job["article_ids"]
            if ids.shape[1] != S:        # keep the compiled shape
                ids = _fit_ids(ids, S)
            staged["article_ids"] = jnp.asarray(ids, jnp.int32)
        if "max_len" in job:   # per-request cap (continuous engine)
            staged["max_len"] = int(np.asarray(job["max_len"]).ravel()[0])
        if "rng_seed" in job:  # per-request PRNG (sampling slots)
            staged["rng_seed"] = int(
                np.asarray(job["rng_seed"]).ravel()[0])
        return staged

    def predict(job: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # stage() is idempotent (jnp.asarray of staged arrays is a
        # no-op), so the direct path and the ingest-thread pipelined
        # path share one staging definition.
        b = stage(job)
        if b.pop("max_len", None) is not None:
            raise ValueError("per-request max_len requires a "
                             "--continuous-slots worker")
        if b.pop("rng_seed", None) is not None:
            raise ValueError("per-request rng_seed requires a "
                             "--sampling-topk --continuous-slots "
                             "worker")
        if spec_gen is not None and "article_ids" in b:
            return {"tokens": np.asarray(spec_gen(params, b))}
        return {"tokens": np.asarray(gen(params, b))}

    def warmup():
        base = {k: np.asarray(v) for k, v in batch.items()
                if k != "caption_ids"}
        predict(base)
        if spec_gen is not None:  # pre-compile the speculative path
            base["article_ids"] = np.ones((B, S), np.int32)
            predict(base)

    predict.warmup = warmup
    predict.stage = stage
    if continuous_beam and continuous_slots <= 0:
        raise ValueError("continuous_beam requires continuous_slots "
                         "> 0 (a plain worker would silently serve "
                         "greedy payloads)")
    if continuous_slots > 0:
        dummy = {
            "image": np.zeros((1, P, 2048), np.float32),
            "image_mask": np.zeros((1, P), bool),
            "article": np.zeros((1, S, 1024), np.float32),
            "article_mask": np.zeros((1, S), bool),
        }
        _attach_continuous(predict, model, params, cfg,
                           continuous_slots, inner_steps,
                           speculative_k, source_len=S, dummy=dummy,
                           beam=continuous_beam,
                           harvest_lag=harvest_lag)
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
        import queue as _queue
        import threading

        logger = setup_logger(f"worker-{self.worker_id}")
        if self.platform is not None:
            import jax
            jax.config.update("jax_platforms", self.platform)
        predict = self.model_builder()
        # Builders may expose .warmup() to pre-compile their jitted
        # paths so the first real job doesn't pay the jit.
        warmup = getattr(predict, "warmup", None)
        if warmup is not None:
            warmup()
        # Builders may expose .stage(job) -> staged input: work that
        # should overlap with the PREVIOUS job's compute — typically
        # host->device transfer of the feature tensors (device_put is
        # async). The ingest thread below runs recv + unpack + stage
        # one job ahead of the predict loop, so transfer of job N+1
        # hides behind decode of job N (the reference serializes
        # these: tasks/captioner.py recv -> predict -> send).
        stage = getattr(predict, "stage", None)
        ctx = zmq.Context()
        receiver = ctx.socket(zmq.PULL)
        receiver.connect(self.receive_addr)
        sink = ctx.socket(zmq.PUSH)
        sink.connect(self.sink_addr)
        staged_q: "_queue.Queue" = _queue.Queue(maxsize=2)

        def ingest():
            while True:
                frames = receiver.recv_multipart()
                try:
                    client_id, job_id = frames[0], frames[1]
                except IndexError:
                    logger.warning("dropping short multipart message "
                                   "(%d frames)", len(frames))
                    continue   # the thread must outlive bad clients
                try:
                    job = unpack(frames[2:])
                    # Stats RPC: no feature tensors, must not hit
                    # stage() (it would KeyError on "image").
                    if not job.get("_stats") and stage is not None:
                        job = stage(job)
                    staged_q.put((client_id, job_id, job, None))
                except Exception as e:   # malformed job / bad stage
                    staged_q.put((client_id, job_id, None, repr(e)))

        threading.Thread(target=ingest, daemon=True).start()
        logger.info("worker %d ready", self.worker_id)
        engine = getattr(predict, "engine", None)
        import time as _time
        t_ready = _time.monotonic()
        n_served = 0
        try:
            if engine is not None:
                self._continuous_loop(engine, staged_q, sink, logger,
                                      worker_id=self.worker_id,
                                      t_ready=t_ready)
                return
            while True:
                client_id, job_id, job, err = staged_q.get()
                if err is not None:
                    result = {"error": err}
                elif job.get("_stats"):
                    result = {"mode": "plain",
                              "worker_id": self.worker_id,
                              "jobs_served": n_served,
                              "uptime_s": round(
                                  _time.monotonic() - t_ready, 1)}
                else:
                    try:
                        result = predict(job)
                        n_served += 1
                    except Exception as e:  # report errors to client
                        result = {"error": repr(e)}
                sink.send_multipart(
                    [client_id, job_id] + pack(result))
        finally:
            receiver.close()
            sink.close()
            ctx.term()

    @staticmethod
    def _continuous_loop(engine, staged_q, sink, logger,
                         worker_id: int = 0, t_ready: float = 0.0):
        """Continuous-batching serving loop: submit staged jobs into
        the slot engine as they arrive, dispatch decode chunks, push
        each caption to the sink the moment ITS slot finishes (the
        plain loop answers jobs strictly in order; here a short
        caption never waits behind a long one)."""
        import queue as _queue
        import time as _time

        import jax

        from news_image_caption_tpu.generation.continuous import \
            ContinuousBeamBatcher
        is_beam = isinstance(engine, ContinuousBeamBatcher)
        pending: Dict[int, tuple] = {}
        while True:
            # Block for work only when fully idle; while slots are
            # decoding, drain arrivals without waiting — but stop
            # admitting once the engine's queue is full (staged
            # features are real device memory; overflow stays as
            # packed bytes in the ZMQ buffers, same backpressure the
            # plain loop gets from staged_q(maxsize=2)).
            block = not pending
            while engine.backlog < engine.max_queue:
                try:
                    item = staged_q.get(block=block)
                except _queue.Empty:
                    break
                block = False
                client_id, job_id, job, err = item
                if err is not None:
                    sink.send_multipart(
                        [client_id, job_id] + pack({"error": err}))
                    continue
                if job.get("_stats"):
                    stats = {"mode": "continuous",
                             "worker_id": worker_id,
                             "in_flight": len(pending),
                             "uptime_s": round(
                                 _time.monotonic() - t_ready, 1),
                             **engine.stats()}
                    sink.send_multipart(
                        [client_id, job_id] + pack(stats))
                    continue
                try:
                    src = job.pop("article_ids", None)
                    if src is not None:
                        src = np.asarray(src)[0]   # [1, S] -> [S]
                    ml = job.pop("max_len", None)
                    seed = job.pop("rng_seed", None)
                    if is_beam:   # beam is exact, draft-free
                        if seed is not None:
                            raise ValueError(
                                "rng_seed requires a --sampling-topk "
                                "worker (this one serves exact beam)")
                        rid = engine.submit(job, max_len=ml)
                    else:
                        # Per-request PRNG: the key the client would
                        # hand to model.generate(rng=...) — results
                        # reproduce it exactly (sampling mode; the
                        # greedy engine ignores the key).
                        rng = (jax.random.PRNGKey(int(seed))
                               if seed is not None else None)
                        rid = engine.submit(job, source_row=src,
                                            max_len=ml, rng=rng)
                    pending[rid] = (client_id, job_id)
                except Exception as e:
                    sink.send_multipart(
                        [client_id, job_id] + pack({"error": repr(e)}))
            if not pending:
                continue
            try:
                done = engine.step()
            except Exception as e:
                # step() reset the engine (donated state): every
                # in-flight request is lost — fail them and keep
                # serving on the fresh pool.
                logger.exception("continuous engine step failed; "
                                 "engine reset")
                for client_id, job_id in pending.values():
                    sink.send_multipart(
                        [client_id, job_id] + pack({"error": repr(e)}))
                pending.clear()
                continue
            # Per-request prep/insert failures (malformed jobs) fail
            # only their own request. pop(rid, None): an unknown rid
            # (e.g. surviving an engine reset) must never kill the
            # loop.
            for rid, e in engine.drain_failed().items():
                entry = pending.pop(rid, None)
                if entry is not None:
                    sink.send_multipart(
                        [entry[0], entry[1]]
                        + pack({"error": repr(e)}))
            for rid, (toks, aux_val) in done.items():
                entry = pending.pop(rid, None)
                if entry is None:
                    continue
                if is_beam:   # [1, beam, L+1] tokens + [1, beam] scores
                    payload = {"tokens": toks[None],
                               "scores": aux_val[None]}
                else:         # [1, L+1] greedy tokens
                    payload = {"tokens": toks[None]}
                sink.send_multipart(
                    [entry[0], entry[1]] + pack(payload))


def full_model_builder(caption_model=None, caption_params=None,
                       use_faces: bool = True, use_objects: bool = True,
                       gen_config=None, return_attns: bool = True,
                       yolo_variables=None, facenet_variables=None,
                       max_faces: int = 4, max_objects: int = 16,
                       yolo_img_size: int = 256):
    """Builder composing detection + captioning like the reference
    CaptioningWorker (tasks/captioner.py:79-144): MTCNN face detect ->
    InceptionResnetV1 embeddings, YOLOv3 object-region features, then
    the faces/objects captioner over raw image + precomputed article
    features. Returns a predict(job) closure whose result carries the
    caption tokens AND the per-context attention maps the reference
    serves (transformer_faces_objects.py:142-190).

    job keys: image_raw [H, W, 3] uint8, article [S, De],
    article_mask [S] (True = pad), image (precomputed patches) or
    image_raw for ResNet upstream.

    yolo_variables: ported darknet weights (port_darknet_weights);
    facenet_variables: ported facenet weights (port_facenet_pt).
    Random init otherwise (smoke tests).
    """
    import jax
    import jax.numpy as jnp

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.facenet import (MTCNN,
                                                       InceptionResnetV1)
    from news_image_caption_tpu.models.variants import nan_to_mask
    from news_image_caption_tpu.models.yolov3 import \
        ObjectFeatureExtractor

    mtcnn = MTCNN() if use_faces else None
    embedder = InceptionResnetV1() if use_faces else None
    if use_faces:
        emb_params = facenet_variables or embedder.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))
        embed_j = jax.jit(embedder.apply)
    objector = (ObjectFeatureExtractor(variables=yolo_variables,
                                       img_size=yolo_img_size)
                if use_objects else None)
    cfg = gen_config or GenerationConfig(max_len=32)
    # Jitted with params as ARGUMENTS (never closure constants — see
    # flagship_model_builder) so repeated request shapes hit the jit
    # cache instead of re-tracing on the serving hot path.
    gen_j = attn_j = None
    if caption_model is not None and caption_params is not None:
        gen_j = jax.jit(lambda p, b: caption_model.generate(p, b, cfg))
        if return_attns and hasattr(caption_model, "attention_maps"):
            attn_j = jax.jit(
                lambda p, b, t: caption_model.attention_maps(p, b, t))

    def _decoder_contexts(model):
        return {name for name, _ in getattr(model.decoder,
                                            "extra_contexts", ())}

    def predict(job):
        out = {}
        img = job.get("image_raw")
        # Fixed-count NaN-padded slots: a faces/objects decoder needs
        # its context every call; undetected slots are NaN -> masked
        # (parity: the NaN convention of transformer_faces_objects).
        faces = np.full((max_faces, 512), np.nan, np.float32)
        objs = np.full((max_objects, 1024), np.nan, np.float32)
        if use_faces and img is not None:
            boxes, _ = mtcnn.detect(img)
            crops = mtcnn.extract_faces(img, boxes[:max_faces])
            if len(crops):
                emb = np.asarray(embed_j(emb_params,
                                         jnp.asarray(crops)))
                faces[:len(emb)] = emb
            out["n_faces"] = np.asarray(len(crops))
        if use_objects and img is not None:
            obj_boxes, obj_feats = objector(img)
            n = min(len(obj_feats), max_objects)
            objs[:n] = obj_feats[:n]
            out["n_objects"] = np.asarray(n)
            out["obj_boxes"] = np.asarray(obj_boxes[:n], np.float32)
        if caption_model is not None and caption_params is not None:
            batch = {k: jnp.asarray(v) for k, v in job.items()
                     if k in ("image", "image_mask", "article",
                              "article_mask")}
            extra = _decoder_contexts(caption_model)
            if "faces" in extra:
                f, fm = nan_to_mask(jnp.asarray(faces)[None])
                batch["faces"], batch["faces_mask"] = f, fm
            if "obj" in extra:
                o, om = nan_to_mask(jnp.asarray(objs)[None])
                batch["obj"], batch["obj_mask"] = o, om
            tokens, _ = gen_j(caption_params, batch)
            out["tokens"] = np.asarray(tokens)
            if attn_j is not None:
                # Attention of every generated position over each
                # context (head-averaged), served like the reference.
                maps = attn_j(caption_params, batch, tokens[:, :-1])
                for li, layer_maps in enumerate(maps):
                    for cname, attn in layer_maps.items():
                        out[f"attn_l{li}_{cname}"] = np.asarray(attn)
        return out

    def warmup():
        """Pre-compile the captioning path before the ready signal
        (first real job must not pay the jit — worker.py:80-82)."""
        if gen_j is None:
            return
        d = caption_model.decoder
        S = 512
        job = {
            "image": np.zeros((1, 49, d.image_dim), np.float32),
            "image_mask": np.zeros((1, 49), bool),
            "article": np.zeros((1, S, d.article_dim), np.float32),
            "article_mask": np.zeros((1, S), bool),
        }
        predict(job)

    predict.warmup = warmup
    return predict
