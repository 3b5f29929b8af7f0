"""Speculative-decode acceptance vs verbatim-span structure.

`spec_decode_trained.py` measured the acceptance/throughput curve
against HANDCRAFTED draft sources (the greedy output embedded in
noise = oracle; corrupted copies; noise). The open question it left
(BASELINE.md "speculative decode", NOTES): what does the DEFAULT
prompt-lookup drafter achieve when drafts come from the article
itself and the caption copies article spans — the regime news
captions actually live in (the reference's pointer family exists
because captions copy entity spans verbatim from articles,
/root/reference/ttl/tell/models/transformer_pointer.py:27-313)?

This harness controls that structure directly. Each training sample
gets an `article_ids` sequence (random BPE ids) and a caption BUILT
from it: copied spans of length `span` taken verbatim from random
article positions, interleaved with fresh random tokens, at copy
fraction f. Groups (one 128-row training batch each):

    f in {0, 1/3, 2/3, 1}  at span 12   (copy-fraction sweep)
    span in {4, 24}        at f = 2/3   (span-length sweep)

The flagship is overfit on all 6 batches (same recipe as
spec_decode_trained: 800 steps @ B=128, peaked regime), then each
group is decoded at B=64 with `generate_speculative` drafting from
the group's own article_ids via the production 2-gram prompt lookup
(ngram_drafts). Reported per (group, spec_k): captions/s, tokens per
chunk (acceptance), speedup vs the greedy scan, token agreement vs
greedy (must be 1.000 — exactness invariant).

Honest scope: features are random (the model memorizes feature ->
caption; article features do not encode article_ids), so this
measures the DRAFTER + VERIFIER mechanics against controlled caption
structure — acceptance as a function of span coverage and span
length — not the model's semantic pointing. That is exactly the
quantity needed to project real-data speedup from a corpus statistic
(fraction of caption tokens inside verbatim article spans).

Run: python benchmarks/spec_decode_spans.py [STEPS] [TRAIN_BATCH]
Numbers + interpretation in BASELINE.md ("speculative decode").
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge  # noqa: E402
from benchmarks.flash_train_bench import flagship  # noqa: E402
from news_image_caption_tpu.generation.generator import \
    GenerationConfig  # noqa: E402
from news_image_caption_tpu.training.optim import make_bert_adam  # noqa: E402
from news_image_caption_tpu.training.train_step import (  # noqa: E402
    create_o2_train_state, make_train_step)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 800
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
EVAL_B, MAX_LEN, STEPS = 64, 60, 10
T, S, VOCAB = 64, 512, 50265

GROUPS = [  # (label, copy_fraction, span_len)
    ("f=0.00 span=12", 0.00, 12),
    ("f=0.33 span=12", 1 / 3, 12),
    ("f=0.67 span=12", 2 / 3, 12),
    ("f=1.00 span=12", 1.00, 12),
    ("f=0.67 span=4 ", 2 / 3, 4),
    ("f=0.67 span=24", 2 / 3, 24),
]


def span_copy_captions(articles: np.ndarray, f: float, span: int,
                       rng: np.random.Generator):
    """Captions [B, T]: BOS, then content tokens 1..T-2 of which a
    fraction ~f sit inside length-`span` verbatim copies from random
    positions of the row's article, rest fresh random ids; eos at
    T-1 (beyond MAX_LEN, so eval decodes fixed-length work). At f=1
    distinct spans abut back-to-back (the 2-gram across a span
    boundary is not in the article, so the drafter re-syncs per
    span — the realistic entity-span structure). Returns
    (captions, actual copy fraction over content positions).

    Placement note (ADVICE r4): spans are packed from the caption
    start with gaps sized to hit `f` overall, so when rounding
    exhausts n_copy early the tail is all-fresh — placement is
    slightly front-loaded rather than uniform. Left as-is so reruns
    stay comparable with the recorded r4 curve (BASELINE.md); the
    printed `actual copy fraction` is the ground truth per group, and
    acceptance depends on span length/coverage, not position, because
    the drafter re-keys every chunk from the committed suffix."""
    Bn = articles.shape[0]
    caps = rng.integers(4, VOCAB, (Bn, T)).astype(np.int32)
    caps[:, 0] = 0
    caps[:, T - 1] = 2
    n_content = T - 2
    copied = 0
    for b in range(Bn):
        n_copy = int(round(f * n_content))
        pos = 1
        while n_copy > 0 and pos < T - 1:
            L = min(span, n_copy, T - 1 - pos)
            s = int(rng.integers(0, S - L))
            caps[b, pos:pos + L] = articles[b, s:s + L]
            n_copy -= L
            copied += L
            # gap sized to hit the target fraction overall
            gap = (0 if f >= 1.0 else
                   max(1, int(round(L * (1 - f) / max(f, 1e-9)))))
            pos += L + gap
    return caps, copied / (Bn * n_content)


def make_group_batch(group_idx: int):
    label, f, span = GROUPS[group_idx]
    rng = np.random.default_rng(100 + group_idx)
    articles = rng.integers(4, VOCAB, (B, S)).astype(np.int32)
    caps, actual_f = span_copy_captions(articles, f, span, rng)
    print(f"group [{label}]: actual copy fraction {actual_f:.3f}",
          flush=True)
    base = ge._batch(B=B, T=T, P=49, S=S, image_dim=2048,
                     article_dim=1024, vocab=VOCAB, key=group_idx)
    base["caption_ids"] = jnp.asarray(caps)
    return base, jnp.asarray(articles)


def _cast(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x, t)


def main():
    batches, article_ids = [], []
    for g in range(len(GROUPS)):
        b, a = make_group_batch(g)
        batches.append(b)
        article_ids.append(a)

    model = flagship(True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batches[0])
    tx = make_bert_adam(lr=5e-5, t_total=N, warmup=0.05)

    def loss_fn(p, b, r):
        return model.loss_fn(p, b, dropout_rng=r)

    step = make_train_step(loss_fn, tx, donate=True,
                           compute_dtype=jnp.bfloat16, o2_master=True)
    state = create_o2_train_state(params, tx)
    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(N):
        state, m = step(state, batches[i % len(GROUPS)], rng)
        if i % 200 == 199:
            print(f"step {i+1}: loss "
                  f"{float(np.asarray(m['loss'])):.4f}", flush=True)
    print(f"trained {N} steps in {time.perf_counter()-t0:.0f}s, "
          f"final loss {float(np.asarray(m['loss'])):.4f}", flush=True)
    params = state.params

    cfg = GenerationConfig(max_len=MAX_LEN, sampling_topk=1)
    gen = jax.jit(lambda p, b: model.generate(p, b, cfg))
    specs = {k: jax.jit(lambda p, b, s, k=k: model.generate_speculative(
        p, b, cfg, spec_k=k, draft_source=s)) for k in (4, 8, 16)}

    for g, (label, f, span) in enumerate(GROUPS):
        batch = _cast(jax.tree.map(lambda x: x[:EVAL_B], batches[g]))
        src = article_ids[g][:EVAL_B]
        out = gen(params, batch)
        greedy_toks = np.asarray(out[0])
        lens = (greedy_toks[:, 1:] != cfg.pad_id).sum(axis=1)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = gen(params, batch)
        np.asarray(out[0])
        base_dt = (time.perf_counter() - t0) / STEPS
        mem = float((greedy_toks[:, 1:MAX_LEN + 1] ==
                     np.asarray(batch["caption_ids"])[:, 1:MAX_LEN + 1])
                    .mean())
        print(f"[{label}] greedy {EVAL_B/base_dt:6.1f} captions/s "
              f"({base_dt*1e3:5.1f} ms) memorized={mem:.3f} "
              f"len={lens.mean():.1f}", flush=True)
        for k, spec in specs.items():
            toks, _, nc = spec(params, batch, src)
            toks_np, nc0 = np.asarray(toks), int(nc)
            agree = float((toks_np == greedy_toks).mean())
            t0 = time.perf_counter()
            for _ in range(STEPS):
                out = spec(params, batch, src)
            np.asarray(out[0])
            dt = (time.perf_counter() - t0) / STEPS
            print(f"[{label}] spec_k={k:2d}: {EVAL_B/dt:7.1f} captions/s "
                  f"({dt*1e3:6.1f} ms) chunks={nc0:3d} "
                  f"tok/chunk={lens.mean()/nc0:4.1f} "
                  f"speedup={base_dt/dt:4.2f}x "
                  f"agree_vs_greedy={agree:.3f}", flush=True)


if __name__ == "__main__":
    main()
