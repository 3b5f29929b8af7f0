"""`tellax` CLI: train / evaluate from a YAML config.

Capability parity target: the `tell (train|evaluate)` docopt CLI
(/root/reference/ttl/tell/commands/__main__.py:1-103) with
-o JSON overrides, -r recover, -s suffix; plus the evaluate command's
generations.jsonl writer (/root/reference/ttl/tell/commands/evaluate.py:31-177).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="tellax")
    sub = p.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="train a model from a YAML config")
    pt.add_argument("param_path")
    pt.add_argument("-o", "--overrides", default=None,
                    help="JSON dict merged over the YAML config")
    pt.add_argument("-r", "--recover", action="store_true",
                    help="resume from the latest checkpoint")
    pt.add_argument("-s", "--serialization-dir", default=None)
    pt.add_argument("--platform", default=None,
                    help="force a JAX backend (e.g. cpu); default = "
                         "environment (TPU). The JAX_PLATFORMS env "
                         "var is not honored in all images; this flag "
                         "uses jax.config.update")

    pe = sub.add_parser("evaluate", help="generate + score on a split")
    pe.add_argument("param_path")
    pe.add_argument("-o", "--overrides", default=None)
    pe.add_argument("-m", "--model-path", default=None,
                    help="checkpoint to load (default: best)")
    pe.add_argument("-s", "--suffix", default="")
    pe.add_argument("--split", default="test")
    pe.add_argument("--no-enrich", action="store_true",
                    help="write bare generation/caption records "
                         "(skip the NER/readability/TTR enrichment "
                         "the reference applies in evaluate)")
    pe.add_argument("--platform", default=None,
                    help="force a JAX backend (e.g. cpu)")
    pe.add_argument("--dump-attention", default=None, metavar="DIR",
                    help="write per-batch attention maps (.npz) over "
                         "the generated captions to DIR (parity: Gen-1 "
                         "eval_utils attention dumping and the serving "
                         "worker's attention-map response)")

    pp = sub.add_parser(
        "preprocess",
        help="materialize raw jsonl records into fixed-shape NICS "
             "shards (offline frozen-encoder pass; "
             "data/materialize.py)")
    pp.add_argument("input_jsonl")
    pp.add_argument("out_prefix")
    # Remaining flags are forwarded verbatim to data/materialize.py
    # (single definition there): --records-per-shard, --caption-len,
    # --article-len, --no-copy-masks.
    pp.add_argument("materialize_flags", nargs=argparse.REMAINDER,
                    help="flags forwarded to data/materialize.py")

    ps = sub.add_parser(
        "serve", help="start the ZMQ captioning server (+HTTP proxy)")
    ps.add_argument("--task", default="flagship",
                    choices=("flagship", "toy"),
                    help="model builder: the production flagship "
                         "captioner, or a tiny random-weight model "
                         "for smoke testing (parity: `python -m "
                         "tell.server TASK`, server/__main__.py:43)")
    ps.add_argument("-n", "--n-workers", type=int, default=1)
    ps.add_argument("--http-port", type=int, default=None,
                    help="also start the HTTP proxy on this port "
                         "(0 = pick a free port)")
    ps.add_argument("--max-len", type=int, default=32)
    ps.add_argument("--batch-size", type=int, default=1,
                    help="request batch the workers pre-compile for")
    ps.add_argument("--quantize-kv", action="store_true")
    ps.add_argument("--quantize-head", action="store_true")
    ps.add_argument("--speculative-k", type=int, default=0,
                    help=">=2 enables exact speculative greedy decode "
                         "for jobs shipping article_ids (token-"
                         "identical to greedy; see "
                         "generation/speculative.py)")
    ps.add_argument("--continuous-slots", type=int, default=0,
                    help="> 0 switches workers to continuous batching "
                         "(generation/continuous.py): a pool of N "
                         "decode slots refilled mid-flight, so a long "
                         "caption never stalls the others; jobs must "
                         "be single requests (B=1); composes with "
                         "--speculative-k")
    ps.add_argument("--inner-steps", type=int, default=8,
                    help="continuous mode: decode steps per device "
                         "dispatch (finished slots are harvested and "
                         "refilled between dispatches)")
    ps.add_argument("--harvest-lag", type=int, default=1,
                    help="continuous mode: chunk dispatches kept in "
                         "flight before blocking on results (pipeline "
                         "depth). 1 hides the device->host fetch "
                         "behind the next chunk; deeper lag amortizes "
                         "high link RTT (remote accelerators) at the "
                         "cost of slots staying frozen longer")
    ps.add_argument("--continuous-beam", action="store_true",
                    help="continuous mode serves EXACT beam search "
                         "(beam_size=5) from the slot pool; results "
                         "carry [beam, L+1] tokens + scores")
    ps.add_argument("--sampling-topk", type=int, default=1,
                    help="> 1 serves top-k SAMPLED captions from the "
                         "slot pool (the reference's own generation "
                         "mode, transformer_flattened.py:296-310); "
                         "per-request PRNG via the job's rng_seed "
                         "field (default: the request id). Requires "
                         "--continuous-slots; excludes "
                         "--continuous-beam/--speculative-k")
    ps.add_argument("--sampling-temp", type=float, default=1.0,
                    help="sampling temperature (with --sampling-topk)")
    ps.add_argument("--no-early-exit", action="store_true")
    ps.add_argument("--params", default=None,
                    help=".npz checkpoint ('/'-joined flat keys) for "
                         "the flagship task")
    ps.add_argument("--platform", default=None,
                    help="force a JAX backend in the workers "
                         "(e.g. cpu); default = environment (TPU)")
    ps.add_argument("--exit-after-ready", action="store_true",
                    help=argparse.SUPPRESS)  # test hook

    po = sub.add_parser(
        "port",
        help="port a reference torch checkpoint (best.th) into this "
             "framework's checkpoint store, ready for `tellax "
             "evaluate`/`serve` (models/port_checkpoint.py: family "
             "autodetected from the state-dict keys)")
    po.add_argument("param_path", help="YAML config of the target model")
    po.add_argument("checkpoint", help="torch state dict (best.th)")
    po.add_argument("-o", "--overrides", default=None)
    po.add_argument("-s", "--serialization-dir", default=None)
    po.add_argument("--no-strict", action="store_true",
                    help="tolerate unconsumed reference keys")

    args = p.parse_args(argv)
    if args.command == "train":
        return train_command(args)
    if args.command == "serve":
        return serve_command(args)
    if args.command == "port":
        return port_command(args)
    if args.command == "preprocess":
        from news_image_caption_tpu.data.materialize import \
            main as materialize_main
        return materialize_main([args.input_jsonl, args.out_prefix]
                                + args.materialize_flags)
    return evaluate_command(args)


def port_command(args) -> int:
    """best.th -> checkpoint store (the reference user's migration
    path: take a Transform-and-Tell `best.th`, port it, then
    `tellax evaluate` / `tellax serve` against the same config)."""
    import jax
    import torch

    from news_image_caption_tpu.config import (build_dataset, build_model,
                                               build_optimizer, load_config)
    from news_image_caption_tpu.models.port_checkpoint import (
        assemble_for_init, merge_into_init, port_checkpoint)
    from news_image_caption_tpu.training.checkpoint import CheckpointStore
    from news_image_caption_tpu.training.train_step import \
        create_train_state

    cfg = load_config(args.param_path, args.overrides)
    model = build_model(cfg)
    ds = build_dataset(cfg, "test")
    sample = next(ds.batches(2, shuffle=False))
    init_params = model.init(jax.random.PRNGKey(0), sample)

    try:
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=True)
    except Exception:
        # Older pickled formats (AllenNLP-era best.th)
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    mcfg = dict(cfg.get("model", {}))
    dcfg = mcfg.get("decoder") or mcfg
    ported = port_checkpoint(
        sd,
        num_layers=int(dcfg.get("num_layers", 4)),
        embed_dim=int(dcfg.get("embed_dim", 1024)),
        n_bands=len(dcfg.get("cutoff", (5000, 20000, 50265))),
        strict=not args.no_strict)
    if ported["unused"]:
        print(f"warning: {len(ported['unused'])} reference keys "
              f"unconsumed: {ported['unused'][:5]}...", file=sys.stderr)
    print(f"detected family: {ported['model']} "
          f"(config model type: {mcfg.get('type')})")

    # Shape the family variables to the model's init tree (gen3
    # pipeline assembly / flattened unwrap) and graft them in; the
    # rules live beside the porters (models/port_checkpoint.py).
    cand, warnings = assemble_for_init(ported, init_params)
    for w in warnings:
        print(w, file=sys.stderr)
    try:
        cand, dropped = merge_into_init(init_params, cand)
    except KeyError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if dropped:
        print(f"note: dropped {len(dropped)} ported leaves the model "
              f"does not own (dead reference params): "
              f"{dropped[:4]}...", file=sys.stderr)

    serialization_dir = (args.serialization_dir
                         or cfg.get("trainer", {}).get("serialization_dir")
                         or os.path.join(
                             os.path.dirname(args.param_path) or ".",
                             "serialization"))
    ckpt_dir = os.path.join(serialization_dir, "checkpoints")
    store = CheckpointStore(ckpt_dir)
    tx = build_optimizer(cfg, model)
    # Match the state shape evaluate will build from this config
    # (bf16_o2 configs restore into an O2 template — fp32 master in
    # opt_state; a plain-state checkpoint would not load).
    if cfg.get("trainer", {}).get("mixed_precision") == "bf16_o2":
        from news_image_caption_tpu.training.train_step import \
            create_o2_train_state
        state = create_o2_train_state(cand, tx)
    else:
        state = create_train_state(cand, tx)
    # metrics entry marks this as 'best' so evaluate's default
    # (-m best) picks the ported weights up directly.
    store.save(state, step=0, metrics={store.best_metric: 0.0})
    print(f"ported checkpoint written to {ckpt_dir} (best + step 0)")

    for enc in ("roberta", "resnet"):
        if enc in ported:
            from flax import serialization as _ser
            path = os.path.join(ckpt_dir, f"{enc}_ported.msgpack")
            with open(path, "wb") as f:
                f.write(_ser.to_bytes(ported[enc]))
            print(f"bundled frozen {enc} encoder written to {path}")
    return 0


def train_command(args) -> int:
    import jax
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)

    from news_image_caption_tpu.config import (build_dataset, build_model,
                                               build_optimizer, load_config)
    from news_image_caption_tpu.data.loader import DeviceLoader
    from news_image_caption_tpu.training.train_step import create_train_state
    from news_image_caption_tpu.training.trainer import (Trainer,
                                                         TrainerConfig)

    cfg = load_config(args.param_path, args.overrides)
    tcfg = cfg.get("trainer", {})
    serialization_dir = (args.serialization_dir
                         or tcfg.get("serialization_dir")
                         or os.path.join(
                             os.path.dirname(args.param_path) or ".",
                             "serialization"))
    model = build_model(cfg)
    train_ds = build_dataset(cfg, "train")
    val_ds = build_dataset(cfg, "val")
    tx = build_optimizer(cfg, model)
    accum = int(tcfg.get("accumulate_steps", 1))
    if accum > 1:
        from news_image_caption_tpu.training.optim import \
            accumulate_gradients
        tx = accumulate_gradients(tx, accum)
    batch_size = cfg.get("iterator", {}).get("batch_size", 16)

    # Multi-chip training: a `trainer.mesh: {data: -1, model: 1}` YAML
    # block builds a jax.sharding.Mesh over the visible devices —
    # params/optimizer state get the partition rules, batches are
    # sharded along the data axis by the DeviceLoader, and XLA inserts
    # the gradient all-reduce / TP psums (SURVEY.md §2.10; same path
    # __graft_entry__.dryrun_multichip validates).
    # Multi-host bootstrap: `trainer.distributed: true` (TPU-pod
    # auto-detect) or a {coordinator_address, num_processes,
    # process_id} block. Must precede mesh construction.
    if tcfg.get("distributed"):
        from news_image_caption_tpu.parallel.distributed import \
            initialize
        dist = tcfg["distributed"]
        initialize(**(dist if isinstance(dist, dict) else {}))
    mesh = batch_sharding = None
    if tcfg.get("mesh"):
        from jax.sharding import NamedSharding, PartitionSpec

        from news_image_caption_tpu.parallel.mesh import (DATA_AXIS,
                                                          MeshConfig,
                                                          make_mesh)
        mesh = make_mesh(MeshConfig(**tcfg["mesh"]))
        batch_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))

    sample = next(train_ds.batches(batch_size))
    params = model.init(jax.random.PRNGKey(tcfg.get("seed", 0)), sample)
    if tcfg.get("mixed_precision") == "bf16_o2":
        from news_image_caption_tpu.training.train_step import \
            create_o2_train_state
        state = create_o2_train_state(params, tx, mesh=mesh)
    else:
        state = create_train_state(params, tx, mesh=mesh)

    trainer = Trainer(model.loss_fn, tx, TrainerConfig(
        num_epochs=tcfg.get("num_epochs", 10),
        patience=tcfg.get("patience"),
        keep_checkpoints=tcfg.get("num_serialized_models_to_keep", 10),
        validation_metric=tcfg.get("validation_metric", "loss"),
        maximize_metric=tcfg.get("maximize_metric", False),
        serialization_dir=serialization_dir,
        mixed_precision=tcfg.get("mixed_precision"),
        accumulate_steps=accum,
        log_every=tcfg.get("log_every", 40),
        summary_interval=tcfg.get("summary_interval", 512),
        checkpoint_format=tcfg.get("checkpoint_format", "msgpack"),
        profile_start=tcfg.get("profile_start", 2),
        profile_steps=tcfg.get("profile_steps", 0),
        seed=tcfg.get("seed", 0)))

    # Multi-host: every host draws the same seeded epoch stream and
    # keeps its round-robin slice (disjoint coverage, deterministic
    # resume); single-process this is the identity.
    from news_image_caption_tpu.parallel.distributed import \
        shard_iterator

    def train_batches(epoch):
        return DeviceLoader(
            shard_iterator(train_ds.batches(batch_size, seed=epoch)),
            sharding=batch_sharding)

    def val_batches(epoch):
        return DeviceLoader(
            shard_iterator(val_ds.batches(batch_size, shuffle=False)),
            sharding=batch_sharding)

    trainer.train(state, train_batches, val_batches,
                  recover=args.recover)
    return 0


def serve_command(args) -> int:
    """Start ZMQ ventilator/sink + N captioning workers and block.

    Capability parity target: `python -m tell.server TASK`
    (/root/reference/ttl/tell/server/__main__.py:43-60 — NLPServer
    with --n-workers/--port/--port-out) plus the Flask HTTP proxy
    (server/http.py:8-66), as one command.
    """
    import functools
    import signal
    import time

    from news_image_caption_tpu.serving.base import CaptionServer
    from news_image_caption_tpu.serving.worker import (
        CaptioningWorker, default_model_builder, flagship_model_builder)
    from news_image_caption_tpu.training.preemption import \
        PreemptionHandler

    if args.continuous_beam and args.continuous_slots <= 0:
        # Never silently serve greedy payloads to a client expecting
        # [beam, L+1] tokens + scores.
        print("error: --continuous-beam requires --continuous-slots N",
              file=sys.stderr)
        return 2
    if args.sampling_topk > 1:
        # Sampling is served from the slot pool only (per-slot PRNG
        # chains, generation/continuous.py); a plain worker would
        # silently serve greedy captions instead of the sampled ones
        # the client asked for.
        if args.continuous_slots <= 0:
            print("error: --sampling-topk requires "
                  "--continuous-slots N", file=sys.stderr)
            return 2
        if args.continuous_beam or args.speculative_k >= 2:
            print("error: --sampling-topk excludes --continuous-beam "
                  "and --speculative-k", file=sys.stderr)
            return 2

    # Graceful SIGTERM (systemd/k8s stop, pod eviction): installed
    # BEFORE worker spawn so a stop during startup still reaches the
    # finally block, which drains the proxy and terminates the worker
    # processes instead of orphaning them.
    guard = PreemptionHandler((signal.SIGTERM,))
    guard.__enter__()

    if args.task == "toy":
        builder = functools.partial(
            default_model_builder,
            speculative_k=args.speculative_k,
            continuous_slots=args.continuous_slots,
            inner_steps=args.inner_steps,
            harvest_lag=args.harvest_lag,
            continuous_beam=args.continuous_beam,
            sampling_topk=args.sampling_topk,
            sampling_temp=args.sampling_temp)
    else:
        builder = functools.partial(
            flagship_model_builder,
            max_len=args.max_len,
            early_exit=not args.no_early_exit,
            quantize_kv=args.quantize_kv,
            quantize_head=args.quantize_head,
            params_path=args.params,
            batch_size=args.batch_size,
            speculative_k=args.speculative_k,
            continuous_slots=args.continuous_slots,
            inner_steps=args.inner_steps,
            harvest_lag=args.harvest_lag,
            continuous_beam=args.continuous_beam,
            sampling_topk=args.sampling_topk,
            sampling_temp=args.sampling_temp)
    server = CaptionServer(
        worker_factory=lambda **kw: CaptioningWorker(
            model_builder=builder, platform=args.platform, **kw),
        num_workers=args.n_workers).start()
    print(json.dumps({
        "frontend_addr": server.frontend_addr,
        "sink_pub_addr": server.sink_pub_addr,
        "task": args.task, "n_workers": args.n_workers}), flush=True)
    httpd = None
    if args.http_port is not None:
        from news_image_caption_tpu.serving.client import \
            CaptioningClient
        from news_image_caption_tpu.serving.http import serve_http
        client = CaptioningClient(server.frontend_addr,
                                  server.sink_pub_addr,
                                  timeout_ms=900000)
        httpd, port = serve_http(client, args.http_port,
                                 {"task": args.task})
        print(json.dumps({"http_port": port}), flush=True)
    try:
        if args.exit_after_ready:
            return 0
        while not guard.triggered:
            time.sleep(0.5)
        return 0
    except KeyboardInterrupt:
        return 0
    finally:
        if httpd is not None:
            httpd.shutdown()
        server.stop()
        guard.__exit__()


def evaluate_command(args) -> int:
    import jax
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from news_image_caption_tpu.config import (build_dataset, build_model,
                                               build_optimizer, load_config)
    from news_image_caption_tpu.evaluation.enrich import enrich_record
    from news_image_caption_tpu.evaluation.metrics import (BleuScorer,
                                                           CiderScorer,
                                                           RougeScorer)
    from news_image_caption_tpu.generation.generator import GenerationConfig
    from news_image_caption_tpu.training.checkpoint import CheckpointStore
    from news_image_caption_tpu.training.train_step import create_train_state

    cfg = load_config(args.param_path, args.overrides)
    model = build_model(cfg)
    ds = build_dataset(cfg, args.split)
    batch_size = cfg.get("iterator", {}).get("batch_size", 16)
    gcfg_raw = cfg.get("generation", {})
    gcfg = GenerationConfig(
        max_len=gcfg_raw.get("max_len", 100),
        sampling_topk=gcfg_raw.get("sampling_topk", 1),
        sampling_temp=gcfg_raw.get("sampling_temp", 1.0),
        beam_size=gcfg_raw.get("beam_size", 5),
        # eval default: stop when every caption in the batch is done
        # (identical outputs, wall-clock tracks the longest caption).
        early_exit=gcfg_raw.get("early_exit", True),
        quantize_kv=gcfg_raw.get("quantize_kv", False))

    sample = next(ds.batches(batch_size, shuffle=False))
    params = model.init(jax.random.PRNGKey(0), sample)
    serialization_dir = (cfg.get("trainer", {}).get("serialization_dir")
                         or os.path.join(
                             os.path.dirname(args.param_path) or ".",
                             "serialization"))
    ckpt_dir = os.path.join(serialization_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        # Honor trainer.checkpoint_format; else detect sharded
        # (directory-per-step) checkpoints on disk.
        fmt = cfg.get("trainer", {}).get("checkpoint_format")
        if fmt is None:
            fmt = ("sharded" if any(
                e.startswith("ckpt_")
                and os.path.isdir(os.path.join(ckpt_dir, e))
                for e in os.listdir(ckpt_dir)) else "msgpack")
        if fmt == "sharded":
            from news_image_caption_tpu.training.checkpoint_sharded \
                import ShardedCheckpointStore
            store = ShardedCheckpointStore(ckpt_dir)
        else:
            store = CheckpointStore(ckpt_dir)
        tx = build_optimizer(cfg, model)
        # The restore template must match the TRAINING state shape:
        # a bf16_o2 run checkpoints the fp32 master copy inside
        # opt_state (apex-O2-true), which a plain template rejects.
        if cfg.get("trainer", {}).get("mixed_precision") == "bf16_o2":
            from news_image_caption_tpu.training.train_step import \
                create_o2_train_state
            state = create_o2_train_state(params, tx)
        else:
            state = create_train_state(params, tx)
        which = args.model_path or "best"
        try:
            if isinstance(which, str) and which.startswith("avg:"):
                # Checkpoint averaging over the newest N (fairseq
                # average_checkpoints trick): `-m avg:5`.
                state = store.load_averaged(state,
                                            last_n=int(which[4:]))
            else:
                state = store.load(state, which)
            params = state.params
        except FileNotFoundError:
            print(f"warning: no checkpoint {which!r}; using random init",
                  file=sys.stderr)

    gen = jax.jit(lambda p, b: model.generate(p, b, gcfg))
    # Opt-in speculative greedy decode (generation.speculative_k: N):
    # token-identical to greedy, drafts from the article's BPE ids
    # (generation/speculative.py). Applies when the batch carries
    # article_ids and decoding is greedy.
    spec_k = int(gcfg_raw.get("speculative_k", 0) or 0)
    # generation.ngram_n tunes the prompt-lookup key length: every
    # verbatim-span boundary costs ~ngram_n re-sync tokens (measured:
    # BASELINE.md span-structure curve), while shorter keys false-match
    # more often on short articles. Default 2 = the production setting.
    # Validated here: ngram_n <= 0 would reach ngram_drafts and die at
    # jit trace with an opaque jnp.stack error (ADVICE r4).
    raw_ngram = gcfg_raw.get("ngram_n", 2)
    ngram_n = 2 if raw_ngram is None else int(raw_ngram)
    if ngram_n < 1:
        raise ValueError(
            f"generation.ngram_n must be >= 1, got {ngram_n}")
    spec_gen = None
    if (spec_k >= 2 and gcfg.sampling_topk == 1
            and hasattr(model, "generate_speculative")):
        spec_gen = jax.jit(lambda p, b: model.generate_speculative(
            p, b, gcfg, spec_k=spec_k, ngram_n=ngram_n))
    dump_attn = getattr(args, "dump_attention", None)
    attn_fn = None
    if dump_attn:
        if not hasattr(model, "attention_maps"):
            print("warning: model has no attention_maps; skipping dump",
                  file=sys.stderr)
            dump_attn = None
        else:
            os.makedirs(dump_attn, exist_ok=True)
            attn_fn = jax.jit(lambda p, b, t:
                              model.attention_maps(p, b, t))
    out_path = os.path.join(serialization_dir,
                            f"generations{args.suffix}.jsonl")
    os.makedirs(serialization_dir, exist_ok=True)
    bleu_s, cider_s, rouge_s = BleuScorer(4), CiderScorer(), RougeScorer()
    n = 0
    batch_idx = 0
    with open(out_path, "w") as f:
        for batch in ds.batches(batch_size, shuffle=False):
            if spec_gen is not None and "article_ids" in batch:
                if batch_idx == 0 and ngram_n > \
                        batch["article_ids"].shape[1] - 1:
                    print(f"warning: generation.ngram_n={ngram_n} "
                          f"exceeds the article window "
                          f"({batch['article_ids'].shape[1]} tokens); "
                          "drafts will be all-pad and speculative "
                          "decode pays pure overhead",
                          file=sys.stderr)
                tokens, aux, _ = spec_gen(params, batch)
            else:
                tokens, aux = gen(params, batch)
            tokens = np.asarray(tokens)
            # Pointer-family generate returns bool copied flags
            # (flags[b, t] covers tokens[b, t+1]); the reference
            # decodes them into generations.jsonl 'copied_texts'
            # (commands/evaluate.py:187-205, '' for other models).
            aux = np.asarray(aux)
            copied = aux if aux.dtype == bool else None
            if dump_attn:
                maps = attn_fn(params, batch, tokens)
                arrays = {"tokens": tokens}
                for li, layer_maps in enumerate(maps):
                    for ctx, arr in layer_maps.items():
                        if arr is not None:
                            arrays[f"layer{li}_{ctx}"] = np.asarray(arr)
                np.savez(os.path.join(dump_attn,
                                      f"attn_{batch_idx:05d}.npz"),
                         **arrays)
            batch_idx += 1
            for b in range(tokens.shape[0]):
                gen_ids = [int(t) for t in tokens[b]
                           if int(t) not in (0, 1)]
                gen_text = " ".join(f"w{t}" for t in gen_ids
                                    if t != 2)
                ref_text = ""
                if hasattr(ds, "__getitem__"):
                    pass  # dataset-specific reference text hookup below
                cap = batch["caption_ids"][b]
                ref_text = " ".join(
                    f"w{int(t)}" for t in np.asarray(cap)
                    if int(t) not in (0, 1, 2))
                bleu_s += (gen_text, [ref_text])
                cider_s += (gen_text, [ref_text])
                rouge_s += (gen_text, [ref_text])
                copied_text = ""
                if copied is not None:
                    copied_text = " ".join(
                        f"w{int(tokens[b, t + 1])}"
                        for t in range(copied.shape[1])
                        if copied[b, t])
                if getattr(args, "no_enrich", False):
                    rec = {"generation": gen_text, "caption": ref_text,
                           "copied_texts": copied_text}
                else:
                    # Reference evaluate enriches every record with
                    # names/entities/readability/TTR as it writes
                    # (commands/evaluate.py:180-356).
                    rec = enrich_record(caption=ref_text,
                                        generation=gen_text,
                                        copied_text=copied_text)
                f.write(json.dumps(rec) + "\n")
                n += 1
    bleu_corpus, _ = bleu_s.compute_score()
    cider_mean, _ = cider_s.compute_score()
    rouge_mean, _ = rouge_s.compute_score()
    metrics = {
        "n_samples": n,
        "bleu-1": bleu_corpus[0] * 100, "bleu-2": bleu_corpus[1] * 100,
        "bleu-3": bleu_corpus[2] * 100, "bleu-4": bleu_corpus[3] * 100,
        "cider": cider_mean, "rouge-l": rouge_mean * 100,
    }
    metrics_path = os.path.join(serialization_dir,
                                f"evaluate-metrics{args.suffix}.json")
    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
