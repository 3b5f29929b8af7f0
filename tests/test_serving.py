"""Serving stack: messages, end-to-end ZMQ round trip, HTTP proxy."""

import json
import urllib.request

import numpy as np
import pytest

from news_image_caption_tpu.serving.messages import pack, unpack


def test_pack_unpack_roundtrip():
    obj = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": "hello",
        "c": [1, 2, 3],
        "d": np.array([True, False]),
    }
    out = unpack(pack(obj))
    np.testing.assert_array_equal(out["a"], obj["a"])
    assert out["b"] == "hello"
    assert out["c"] == [1, 2, 3]
    np.testing.assert_array_equal(out["d"], obj["d"])


def test_pack_upcasts_bfloat16_for_vanilla_numpy_clients():
    """bf16 result arrays (attention maps from a bf16 model) must be
    decodable by clients that import only numpy — the wire carries
    float32 (value-exact upcast), never the 'bfloat16' dtype string."""
    import jax.numpy as jnp
    x = np.asarray(jnp.asarray([[1.5, -2.25]], jnp.bfloat16))
    frames = pack({"attn": x})
    import json as _json
    meta = _json.loads(frames[0])["keys"]["attn"]
    assert meta["dtype"] == "float32"
    out = unpack(frames)
    np.testing.assert_array_equal(out["attn"],
                                  x.astype(np.float32))


def test_worker_survives_short_multipart(server_and_client):
    """A malformed 1-frame message must not kill the ingest thread
    (the liveness monitor cannot see a wedged-but-alive worker)."""
    import zmq
    server, client = server_and_client
    ctx = zmq.Context()
    s = ctx.socket(zmq.PUSH)
    s.connect(server.frontend_addr)
    s.send_multipart([b"junk-single-frame"])
    s.close()
    ctx.term()
    result = client.caption(make_job())   # worker still serves
    assert "tokens" in result


@pytest.fixture(scope="module")
def server_and_client():
    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import CaptioningWorker

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=120000)
    yield server, client
    client.close()
    server.stop()


def make_job(B=1):
    rng = np.random.default_rng(0)
    return {
        "image": rng.standard_normal((B, 4, 16)).astype(np.float32),
        "image_mask": np.zeros((B, 4), bool),
        "article": rng.standard_normal((B, 6, 24)).astype(np.float32),
        "article_mask": np.zeros((B, 6), bool),
    }


def test_zmq_round_trip(server_and_client):
    _, client = server_and_client
    result = client.caption(make_job())
    assert "tokens" in result
    assert result["tokens"].shape == (1, 17)


def test_speculative_worker_matches_plain(server_and_client):
    """A speculative_k worker returns token-identical captions for
    jobs WITH article_ids (speculative path) and without (fallback),
    both matching the plain worker's greedy output."""
    import functools

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder)

    _, plain_client = server_and_client
    ref = plain_client.caption(make_job())["tokens"]

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=functools.partial(default_model_builder,
                                            speculative_k=3),
            platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=120000)
    try:
        job = make_job()
        no_ids = client.caption(job)["tokens"]
        job_ids = dict(job)
        # Article containing the greedy caption: lookup drafts accept.
        job_ids["article_ids"] = np.concatenate(
            [np.asarray(ref, np.int32),
             np.ones((1, 4), np.int32)], axis=1)
        with_ids = client.caption(job_ids)["tokens"]
    finally:
        client.close()
        server.stop()
    np.testing.assert_array_equal(no_ids, ref)
    np.testing.assert_array_equal(with_ids, ref)


def test_fit_ids_pads_and_trims():
    """article_ids are shaped to the pre-compiled [B, S] host-side so
    odd lengths never re-jit the speculative path mid-serving."""
    from news_image_caption_tpu.serving.worker import _fit_ids

    ids = np.arange(8, dtype=np.int32).reshape(1, 8)
    np.testing.assert_array_equal(_fit_ids(ids, 8), ids)
    np.testing.assert_array_equal(_fit_ids(ids, 4), ids[:, :4])
    padded = _fit_ids(ids, 11)
    assert padded.shape == (1, 11)
    np.testing.assert_array_equal(padded[:, :8], ids)
    assert (padded[:, 8:] == 1).all()


def test_multiple_jobs_in_order(server_and_client):
    _, client = server_and_client
    r1 = client.caption(make_job())
    r2 = client.caption(make_job())
    np.testing.assert_array_equal(r1["tokens"], r2["tokens"])


def test_caption_stream_pipelined_in_order(server_and_client):
    """Pipelined client: results come back in submission order and
    match the closed-loop path (the worker's ingest thread stages
    job N+1 while job N runs)."""
    _, client = server_and_client
    ref = client.caption(make_job())
    results = list(client.caption_stream(
        (make_job() for _ in range(6)), window=3))
    assert len(results) == 6
    for r in results:
        np.testing.assert_array_equal(r["tokens"], ref["tokens"])


def test_caption_stream_error_raises(server_and_client):
    _, client = server_and_client
    jobs = [make_job(), {"image": np.zeros((1, 2), np.float32)}]
    with pytest.raises(RuntimeError):
        list(client.caption_stream(iter(jobs), window=2))
    # the stream error must not wedge the worker for later jobs
    assert "tokens" in client.caption(make_job())


def test_worker_error_propagates(server_and_client):
    _, client = server_and_client
    bad = {"image": np.zeros((1, 2), np.float32)}  # malformed job
    with pytest.raises(RuntimeError):
        client.caption(bad)


def test_worker_stats_rpc(server_and_client):
    """The `_stats` job RPC reports plain-worker telemetry through
    the normal job routing (no dedicated control socket)."""
    _, client = server_and_client
    client.caption(make_job())
    stats = client.stats()
    assert stats["mode"] == "plain" and stats["worker_id"] == 0
    n = stats["jobs_served"]
    assert n >= 1 and stats["uptime_s"] >= 0
    client.caption(make_job())
    assert client.stats()["jobs_served"] == n + 1


def test_http_proxy(server_and_client):
    from news_image_caption_tpu.serving.http import serve_http
    _, client = server_and_client
    httpd, port = serve_http(client, server_info={"model": "tiny"})
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status") as r:
            status = json.loads(r.read())
        assert status["status"] == "ok" and status["model"] == "tiny"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status/worker") as r:
            wstat = json.loads(r.read())
        assert wstat["status"] == "ok" and wstat["mode"] == "plain"
        assert "jobs_served" in wstat

        job = make_job()
        payload = {k: {"data": v.tolist(), "dtype": str(v.dtype)}
                   for k, v in job.items()}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            result = json.loads(r.read())
        assert "tokens" in result
        assert len(result["tokens"][0]) == 17

        # `_stats` is reserved for the telemetry RPC: a user payload
        # carrying it must still get a caption, not a stats response.
        payload["_stats"] = True
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            hijack = json.loads(r.read())
        assert "tokens" in hijack and "jobs_served" not in hijack
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_worker_respawn_after_crash():
    """Serving-side failure recovery: when a worker process dies, the
    liveness monitor respawns it and later jobs succeed (the
    reference has no analogue — a dead task process silently drains
    jobs)."""
    import time

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import CaptioningWorker

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(platform="cpu",
                                                     **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=180000)
    try:
        ref = client.caption(make_job())
        server._workers[0].kill()
        deadline = time.time() + 60
        while server.respawn_count == 0 and time.time() < deadline:
            time.sleep(0.5)
        assert server.respawn_count >= 1
        # the respawned worker recompiles, then serves again
        out = client.caption(make_job())
        np.testing.assert_array_equal(out["tokens"], ref["tokens"])
    finally:
        client.close()
        server.stop()


@pytest.mark.slow
def test_cli_serve_end_to_end():
    """`tellax serve --task toy` starts the full stack from the CLI;
    a caption goes through the HTTP proxy (parity:
    `python -m tell.server TASK`, server/__main__.py:43-60)."""
    import subprocess
    import sys as _sys
    import time

    proc = subprocess.Popen(
        [_sys.executable, "-m", "news_image_caption_tpu.cli", "serve",
         "--task", "toy", "--platform", "cpu", "--http-port", "0"],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo")
    try:
        info = json.loads(proc.stdout.readline())
        assert info["task"] == "toy" and "frontend_addr" in info
        port = json.loads(proc.stdout.readline())["http_port"]
        job = make_job()
        payload = {k: {"data": v.tolist(), "dtype": str(v.dtype)}
                   for k, v in job.items()}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        deadline = time.time() + 180
        result = None
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(req, timeout=180) as r:
                    result = json.loads(r.read())
                break
            except Exception:
                time.sleep(2)
        assert result is not None and "tokens" in result
        assert len(result["tokens"][0]) == 17
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_serve_sigterm_graceful_shutdown():
    """SIGTERM to the serve CLI (systemd/k8s stop, pod eviction)
    drains the proxy and terminates the worker processes — graceful
    exit 0, no orphaned children."""
    import subprocess
    import sys as _sys

    proc = subprocess.Popen(
        [_sys.executable, "-m", "news_image_caption_tpu.cli", "serve",
         "--task", "toy", "--platform", "cpu"],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo")
    try:
        info = json.loads(proc.stdout.readline())   # workers ready
        assert "frontend_addr" in info
        proc.terminate()                            # SIGTERM
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


@pytest.mark.slow
def test_full_model_builder_objects_and_attention_maps():
    """Objects context is attached to the caption batch and attention
    maps are returned (ref: tasks/captioner.py + faces_objects
    generate, transformer_faces_objects.py:142-190)."""
    import jax

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened
    from news_image_caption_tpu.serving.worker import full_model_builder

    model = TransformerFlattened(
        vocab_size=64, cutoff=(16, 32, 64), embed_dim=32, ffn_dim=64,
        num_heads=4, num_layers=2, kernel_sizes=(3, 5), image_dim=16,
        article_dim=24, max_positions=64,
        extra_contexts=(("faces", 512), ("obj", 1024)))
    rng = np.random.default_rng(0)
    B, P, S, MAXF, MAXO = 1, 4, 6, 4, 16
    init_batch = {
        "caption_ids": np.zeros((B, 8), np.int32),
        "image": rng.standard_normal((B, P, 16)).astype(np.float32),
        "image_mask": np.zeros((B, P), bool),
        "article": rng.standard_normal((B, S, 24)).astype(np.float32),
        "article_mask": np.zeros((B, S), bool),
        "faces": np.zeros((B, MAXF, 512), np.float32),
        "faces_mask": np.zeros((B, MAXF), bool),
        "obj": np.zeros((B, MAXO, 1024), np.float32),
        "obj_mask": np.zeros((B, MAXO), bool),
    }
    params = model.init(jax.random.PRNGKey(0), init_batch)

    predict = full_model_builder(
        caption_model=model, caption_params=params,
        use_faces=False, use_objects=True, yolo_img_size=64,
        max_faces=MAXF, max_objects=MAXO,
        gen_config=GenerationConfig(max_len=6))
    job = {
        "image_raw": rng.integers(0, 255, (80, 60, 3)).astype(np.uint8),
        "image": init_batch["image"],
        "image_mask": init_batch["image_mask"],
        "article": init_batch["article"],
        "article_mask": init_batch["article_mask"],
    }
    out = predict(job)
    assert "tokens" in out and out["tokens"].shape[0] == B
    assert "n_objects" in out
    # Attention maps for every layer and every context, incl. obj.
    T = out["tokens"].shape[1] - 1
    for li in range(2):
        for cname, src in (("image", P), ("article", S),
                           ("faces", MAXF), ("obj", MAXO)):
            key = f"attn_l{li}_{cname}"
            assert key in out, key
            # S' = src + bias_kv + zero_attn slots
            assert out[key].shape == (B, T, src + 2)
            s = out[key].sum(-1)
            np.testing.assert_allclose(s, np.ones_like(s), rtol=1e-3)


def test_unflatten_params_roundtrip():
    from news_image_caption_tpu.serving.worker import unflatten_params
    tree = {"a": {"b": {"kernel": np.ones((2, 3)), "bias": np.zeros(3)},
                  "c": np.full((4,), 7.0)},
            "d": np.arange(5)}

    def flatten(node, prefix=""):
        out = {}
        for k, v in node.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, key + "/"))
            else:
                out[key] = v
        return out

    flat = flatten(tree)
    rebuilt = unflatten_params(flat)
    assert set(rebuilt) == {"a", "d"}
    np.testing.assert_array_equal(rebuilt["a"]["b"]["kernel"],
                                  tree["a"]["b"]["kernel"])
    np.testing.assert_array_equal(rebuilt["a"]["c"], tree["a"]["c"])
    np.testing.assert_array_equal(rebuilt["d"], tree["d"])


def test_unflatten_params_restores_bf16_from_npz_void():
    """np.savez stores ml_dtypes.bfloat16 as raw void (V2); loading an
    exported bf16_o2 checkpoint must view it back (caught live by the
    r4 spec-decode bench on the e2e run's flagship_trained.npz)."""
    import io

    import ml_dtypes

    from news_image_caption_tpu.serving.worker import unflatten_params

    w = (np.arange(6, dtype=np.float32).reshape(2, 3)
         * 0.25).astype(ml_dtypes.bfloat16)
    buf = io.BytesIO()
    np.savez(buf, **{"layer/kernel": w, "layer/bias":
                     np.zeros(3, np.float32)})
    buf.seek(0)
    rebuilt = unflatten_params(dict(np.load(buf)))
    assert rebuilt["layer"]["kernel"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        rebuilt["layer"]["kernel"].astype(np.float32),
        w.astype(np.float32))
    assert rebuilt["layer"]["bias"].dtype == np.float32


def make_varied_job(seed: int, B=1):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.standard_normal((B, 4, 16)).astype(np.float32),
        "image_mask": np.zeros((B, 4), bool),
        "article": rng.standard_normal((B, 6, 24)).astype(np.float32),
        "article_mask": np.zeros((B, 6), bool),
    }


def test_continuous_worker_matches_plain(server_and_client):
    """A continuous-batching worker (slot pool + mid-flight refill,
    generation/continuous.py) returns captions token-identical to the
    plain per-job worker — for MORE in-flight jobs than slots, so
    harvest-and-refill actually happens, and with results routed by
    job id (a short caption may return before a long one)."""
    import functools

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder)

    _, plain_client = server_and_client
    jobs = [make_varied_job(s) for s in range(5)]
    refs = [plain_client.caption(j)["tokens"] for j in jobs]

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=functools.partial(default_model_builder,
                                            continuous_slots=2,
                                            inner_steps=2),
            platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=240000)
    try:
        # 5 jobs streamed with all of them in flight: 2 slots must
        # harvest + refill to drain the queue.
        results = list(client.caption_stream(iter(jobs), window=5))
        # error propagation through the continuous loop: the worker
        # must answer (not hang) and the engine must keep serving
        bad = {"image": np.zeros((1, 2), np.float32)}
        with pytest.raises(RuntimeError):
            client.caption(bad)
        after = client.caption(jobs[0])["tokens"]
        # per-request length cap rides the job dict ("max_len")
        capped_job = dict(jobs[0])
        capped_job["max_len"] = 2
        capped = client.caption(capped_job)["tokens"]
        # engine telemetry through the same routing
        stats = client.stats()
        assert stats["mode"] == "continuous"
        assert stats["engine"] == "ContinuousBatcher"
        assert stats["slots"] == 2 and stats["inner_steps"] == 2
        assert stats["in_flight"] == 0 and stats["n_chunks"] > 0
        assert 0 < stats["occupancy"] <= 1.0
    finally:
        client.close()
        server.stop()
    assert len(results) == 5
    for got, want in zip(results, refs):
        np.testing.assert_array_equal(got["tokens"], want)
    np.testing.assert_array_equal(after, refs[0])
    np.testing.assert_array_equal(capped[0, :3], refs[0][0, :3])
    assert np.all(capped[0, 3:] == 1)   # pad after the cap


def test_continuous_spec_worker_matches_plain(server_and_client):
    """The COMPOSED production serving mode — continuous slot pool
    with speculative drafting in every slot (continuous_slots > 0 AND
    speculative_k >= 2, the `tellax serve --continuous-slots 16
    --speculative-k 4` configuration; measured 1.81x on TPU,
    BASELINE.md "composed production serving") — must stay
    token-identical to the plain per-job worker at the ZMQ level:
    jobs WITH article_ids draft from their own source row, jobs
    without draft from the pad source (all-pad drafts, pure verify) —
    exactness holds either way because commits come from the chunk
    forward only (generation/speculative.py::greedy_verify)."""
    import functools

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder)

    _, plain_client = server_and_client
    jobs = [make_varied_job(s) for s in range(5)]
    rng = np.random.default_rng(99)
    for j in jobs[:3]:   # 3 jobs carry article ids, 2 fall back
        j["article_ids"] = rng.integers(
            4, 64, (1, 6)).astype(np.int32)
    refs = [plain_client.caption(
        {k: v for k, v in j.items() if k != "article_ids"})["tokens"]
        for j in jobs]

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=functools.partial(default_model_builder,
                                            continuous_slots=2,
                                            inner_steps=2,
                                            speculative_k=3),
            platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=240000)
    try:
        results = list(client.caption_stream(iter(jobs), window=5))
        stats = client.stats()
        assert stats["engine"] == "ContinuousBatcher"
        assert stats["spec_k"] == 3
        assert stats["in_flight"] == 0 and stats["n_chunks"] > 0
    finally:
        client.close()
        server.stop()
    assert len(results) == 5
    for got, want in zip(results, refs):
        np.testing.assert_array_equal(got["tokens"], want)


def test_continuous_beam_worker_matches_generate_beam(server_and_client):
    """--continuous-beam: the worker serves EXACT beam search from the
    slot pool; payloads carry [1, beam, L+1] tokens + scores matching
    standalone generate_beam."""
    import functools

    import jax

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened
    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder)

    # standalone reference: same toy model/params as the builder
    model = TransformerFlattened(
        vocab_size=64, cutoff=(16, 32, 64), embed_dim=32, ffn_dim=64,
        num_heads=4, num_layers=2, kernel_sizes=(3, 5), image_dim=16,
        article_dim=24, max_positions=64)
    jobs = [make_varied_job(s) for s in range(3)]
    init = dict(jobs[0])
    init["caption_ids"] = np.zeros((1, 8), np.int32)
    params = model.init(jax.random.PRNGKey(0), init)
    cfg = GenerationConfig(max_len=16, early_exit=True)
    refs = [model.generate_beam(params, j, cfg) for j in jobs]

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=functools.partial(default_model_builder,
                                            continuous_slots=2,
                                            inner_steps=2,
                                            continuous_beam=True),
            platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=240000)
    try:
        results = list(client.caption_stream(iter(jobs), window=3))
        stats = client.stats()
        assert stats["engine"] == "ContinuousBeamBatcher"
        assert stats["beam_size"] == 5 and stats["in_flight"] == 0
    finally:
        client.close()
        server.stop()
    for got, (want_t, want_s) in zip(results, refs):
        assert got["tokens"].shape == (1, 5, 17)
        np.testing.assert_array_equal(got["tokens"][0],
                                      np.asarray(want_t[0]))
        np.testing.assert_allclose(got["scores"][0],
                                   np.asarray(want_s[0]),
                                   rtol=1e-5, atol=1e-6)


def test_sampling_worker_matches_generate_with_seed(server_and_client):
    """--sampling-topk serving: a continuous worker with
    sampling_topk > 1 serves top-k SAMPLED captions (the reference's
    own generation mode, transformer_flattened.py:296-310) from the
    slot pool; a job's `rng_seed` reproduces
    model.generate(request, cfg, rng=PRNGKey(seed)) token-for-token,
    regardless of slot timing (mirrors the engine-level
    test_sampling_slots_match_generate_with_same_rng)."""
    import functools

    import jax

    from news_image_caption_tpu.generation.generator import \
        GenerationConfig
    from news_image_caption_tpu.models.captioner import \
        TransformerFlattened
    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.client import CaptioningClient
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder)

    _, plain_client = server_and_client

    # standalone reference: same toy model/params as the builder
    model = TransformerFlattened(
        vocab_size=64, cutoff=(16, 32, 64), embed_dim=32, ffn_dim=64,
        num_heads=4, num_layers=2, kernel_sizes=(3, 5), image_dim=16,
        article_dim=24, max_positions=64)
    jobs = [make_varied_job(s) for s in range(5)]
    init = dict(jobs[0])
    init["caption_ids"] = np.zeros((1, 8), np.int32)
    params = model.init(jax.random.PRNGKey(0), init)
    cfg = GenerationConfig(max_len=16, sampling_topk=4,
                           sampling_temp=0.8)
    seeds = [1000 + i for i in range(5)]
    refs = [np.asarray(model.generate(
                params, j, cfg, rng=jax.random.PRNGKey(s))[0][0])
            for j, s in zip(jobs, seeds)]

    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=functools.partial(default_model_builder,
                                            continuous_slots=2,
                                            inner_steps=2,
                                            sampling_topk=4,
                                            sampling_temp=0.8),
            platform="cpu", **kw),
        num_workers=1).start()
    client = CaptioningClient(server.frontend_addr,
                              server.sink_pub_addr, timeout_ms=240000)
    try:
        seeded = [dict(j, rng_seed=s) for j, s in zip(jobs, seeds)]
        results = list(client.caption_stream(iter(seeded), window=5))
        # sampling is the default without a seed too (rid-keyed):
        # the job must still be answered, just not seed-reproducible
        unseeded = client.caption(jobs[0])
        stats = client.stats()
        assert stats["mode"] == "continuous"
        assert stats["sampling_topk"] == 4
    finally:
        client.close()
        server.stop()
    assert len(results) == 5
    for got, want in zip(results, refs):
        np.testing.assert_array_equal(got["tokens"][0], want)
    assert unseeded["tokens"].shape == (1, 17)
    # at topk 4 / temp 0.8 the sampled captions must not all equal
    # the greedy decode (sanity that the draw path actually ran)
    greedy = plain_client.caption(jobs[0])["tokens"][0]
    assert not all(np.array_equal(r, greedy) for r in refs)
    # rng_seed on a PLAIN worker is honor-or-reject, never silently
    # greedy
    with pytest.raises(RuntimeError):
        plain_client.caption(dict(jobs[0], rng_seed=7))


def test_sampling_args_validation():
    from news_image_caption_tpu.serving.worker import (
        default_model_builder)

    with pytest.raises(ValueError):   # needs the slot pool
        default_model_builder(sampling_topk=4)
    with pytest.raises(ValueError):   # beam is exact, not sampled
        default_model_builder(sampling_topk=4, continuous_slots=2,
                              continuous_beam=True)
    with pytest.raises(ValueError):   # draft-verify commit is greedy
        default_model_builder(sampling_topk=4, continuous_slots=2,
                              speculative_k=4)
