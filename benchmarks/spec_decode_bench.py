"""Speculative greedy decode: throughput vs draft acceptance rate.

Measures the flagship model (bf16, DecodeKV) at B x 100 tokens:
- plain greedy scan (the baseline `generate` path);
- speculative decode (generate_speculative) against draft sources of
  controlled quality: ORACLE (the greedy output embedded in the
  source — ceiling), CORRUPT-p (every token independently corrupted
  with probability p — intermediate acceptance), NOISE (random ids —
  worst case: every chunk commits exactly 1 token, so this measures
  the chunk-forward overhead directly).

eos_id=-1 in all runs so every row decodes the full 100 tokens
(fixed work; random weights would otherwise emit eos at arbitrary
steps and make the comparison ragged). Acceptance on REAL trained
checkpoints with real articles is workload-dependent; these sweeps
bound the win (oracle) and the loss (noise).

Exactness on TPU, learned the hard way (r4): every committed token
comes from the CHUNK forward, so speculative output is
DRAFT-INDEPENDENT by construction — that is the mechanism invariant
this bench asserts (`self_consistent`). Bit-equality with the
step-path greedy scan additionally requires chunk and step matmuls
to round identically, which the MXU does not guarantee across
shapes; with RANDOM weights the top-1/top-2 logit gap at vocab 50k
is ~spread/50k — far below bf16 resolution — so argmax flips at
nearly every token and `agree_vs_greedy` is ~0 AND acceptance is ~0
(the r3 queue measured exactly that: tok/chunk=1.0 even for oracle
drafts). On trained (peaked) checkpoints the gap is orders of
magnitude above the rounding noise; pass --params to measure the
real acceptance/throughput curve.

Run: python benchmarks/spec_decode_bench.py [--model=pointer]
         [--params ckpt.npz] [BATCH ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402

MAX_LEN, STEPS = 100, 10


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def _pointer_extras(batch, vocab=50265, key=11):
    """article_ids + context_proper_masks (~10% proper): the pointer
    family's generate contract (copy head over the article ids)."""
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    S = batch["article"].shape[1]
    B = batch["article"].shape[0]
    ids = jax.random.randint(ks[0], (B, S), 4, vocab)
    proper = (jax.random.uniform(ks[1], ids.shape)
              < 0.1).astype(jnp.int32)
    return {**batch, "article_ids": ids,
            "context_proper_masks": proper}


def _load_params(path):
    import numpy as _np

    from news_image_caption_tpu.serving.worker import unflatten_params
    p = unflatten_params(dict(_np.load(path)))
    return jax.tree.map(jnp.asarray, p)


def _build(which, params_path=None):
    if which == "pointer":
        from news_image_caption_tpu.models.pointer import \
            TransformerPointer
        model = TransformerPointer(
            captioner=ge._flagship(dtype=jnp.bfloat16),
            embed_dim=1024, num_heads=16, article_dim=1024,
            vocab_size=50265)
        init_b = _pointer_extras(_cast(ge._batch(
            B=2, T=32, P=49, S=512, image_dim=2048,
            article_dim=1024, vocab=50265)))
        params = _cast(jax.jit(model.init)(jax.random.PRNGKey(0),
                                           init_b))
        return model, params
    model = ge._flagship(dtype=jnp.bfloat16)
    if params_path is not None:
        params = _cast(_load_params(params_path))
    else:
        params = _cast(jax.jit(model.init)(
            jax.random.PRNGKey(0),
            ge._batch(B=2, T=32, P=49, S=512, image_dim=2048,
                      article_dim=1024, vocab=50265)))
    return model, params


def main():
    args = [a for a in sys.argv[1:]]
    which = "flagship"
    if "--model=pointer" in args:
        which = "pointer"
        args.remove("--model=pointer")
    params_path = None
    if "--params" in args:
        i = args.index("--params")
        params_path = args[i + 1]
        del args[i:i + 2]
        if which == "pointer":
            raise SystemExit("--params supports the flagship only")
    shards_glob = None
    if "--shards" in args:
        # In-distribution eval features for a --params checkpoint
        # (e.g. the e2e run's train shards): acceptance on a trained
        # model is only meaningful where its logits are peaked.
        i = args.index("--shards")
        shards_glob = args[i + 1]
        del args[i:i + 2]
    model, params = _build(which, params_path)
    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1, eos_id=-1)

    for B in [int(a) for a in (args or ["64"])]:
        if shards_glob is not None:
            import glob as _glob

            from news_image_caption_tpu.data.native_loader import \
                NativeShardLoader
            loader = NativeShardLoader(sorted(_glob.glob(shards_glob)),
                                       batch_size=B)
            raw = next(loader.epoch(shuffle=False))
            batch = {
                "image": jnp.asarray(raw["image"], jnp.bfloat16),
                "image_mask": jnp.asarray(
                    raw["image_mask"].astype(bool)),
                "article": jnp.asarray(raw["article"], jnp.bfloat16),
                "article_mask": jnp.asarray(
                    raw["article_mask"].astype(bool)),
            }
            loader.close()
        else:
            batch = _cast(ge._batch(B=B, T=32, P=49, S=512,
                                    image_dim=2048,
                                    article_dim=1024, vocab=50265))
        if which == "pointer":
            batch = _pointer_extras(batch)

        gen = jax.jit(lambda p, b: model.generate(p, b, cfg))
        out = gen(params, batch)
        greedy_toks = np.asarray(out[0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = gen(params, batch)
        np.asarray(out[0])
        base_dt = (time.perf_counter() - t0) / STEPS
        print(f"B={B} greedy scan: {B/base_dt:.1f} captions/s "
              f"({base_dt*1e3:.1f} ms/batch)")

        # Draft sources: noise prefix + (possibly corrupted) greedy
        # caption + noise tail, so the n-gram lookup has to actually
        # find the continuation.
        key = jax.random.PRNGKey(1)
        noise = jax.random.randint(key, (B, 32), 4, 50265)
        oracle = jnp.asarray(greedy_toks)

        def corrupted(p, key):
            flip = jax.random.bernoulli(key, p, oracle.shape)
            junk = jax.random.randint(key, oracle.shape, 4, 50265)
            return jnp.where(flip, junk, oracle)

        sources = {
            "oracle": jnp.concatenate([noise, oracle, noise], axis=1),
            "corrupt25": jnp.concatenate(
                [noise, corrupted(0.25, jax.random.PRNGKey(2)), noise],
                axis=1),
            "corrupt50": jnp.concatenate(
                [noise, corrupted(0.50, jax.random.PRNGKey(3)), noise],
                axis=1),
            "noise": jax.random.randint(
                jax.random.PRNGKey(4), (B, 164), 4, 50265),
        }

        for spec_k in (4, 8, 16):
            # Drafts go in via draft_source (NOT by overwriting
            # article_ids — the pointer's copy head reads those).
            spec = jax.jit(lambda p, b, s, k=spec_k:
                           model.generate_speculative(p, b, cfg,
                                                      spec_k=k,
                                                      draft_source=s))
            spec_outs = {}
            for name, src in sources.items():
                toks, _, nc = spec(params, batch, src)
                toks_np, nc0 = np.asarray(toks), int(nc)
                spec_outs[name] = toks_np
                agree = float((toks_np == greedy_toks).mean())
                t0 = time.perf_counter()
                for _ in range(STEPS):
                    out = spec(params, batch, src)
                np.asarray(out[0])
                dt = (time.perf_counter() - t0) / STEPS
                print(f"B={B} spec_k={spec_k:2d} {name:9s}: "
                      f"{B/dt:7.1f} captions/s ({dt*1e3:6.1f} ms) "
                      f"chunks={nc0:3d} tok/chunk={MAX_LEN/nc0:4.1f} "
                      f"speedup={base_dt/dt:4.2f}x "
                      f"agree_vs_greedy={agree:.3f}", flush=True)
            # Mechanism invariant (see module docstring): committed
            # tokens come from the chunk forward only, so outputs
            # must be IDENTICAL across draft sources. A violation
            # here is a cache-commit bug, not numerics.
            names = list(spec_outs)
            self_consistent = all(
                (spec_outs[n] == spec_outs[names[0]]).all()
                for n in names[1:])
            print(f"B={B} spec_k={spec_k:2d} self_consistent="
                  f"{self_consistent}  (oracle==corrupt==noise "
                  f"outputs: required)", flush=True)
            if not self_consistent:
                for n in names[1:]:
                    frac = float(
                        (spec_outs[n] == spec_outs[names[0]]).mean())
                    print(f"  {names[0]} vs {n}: {frac:.4f} "
                          f"token agreement", flush=True)


if __name__ == "__main__":
    main()
