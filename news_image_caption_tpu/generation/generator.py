"""On-device batched generation: greedy / top-k sampling / beam search.

Capability parity targets:
- top-k sampled incremental generation:
  /root/reference/ttl/tell/models/transformer_flattened.py:240-328
- per-image CPU beam search (Gen-1):
  /root/reference/models/CaptionModel.py:23-122

TPU-first design: one `lax.scan` over decode steps with a fixed-shape
carry (token buffer, finished mask, per-layer conv caches, PRNG key).
The reference shrinks the batch as sequences finish
(transformer_flattened.py:312-319); here finished sequences are
masked (emit pad, zero log-prob) — identical outputs, static shapes.
Cross-attention K/V are precomputed once before the scan. Beam search
folds the beam dimension into the batch (B*beam "sequences") so every
step is one big MXU-friendly batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class GenerationConfig:
    max_len: int = 100
    eos_id: int = 2
    pad_id: int = 1
    bos_id: int = 0
    sampling_topk: int = 1
    sampling_temp: float = 1.0
    beam_size: int = 5
    length_penalty: float = 1.0
    # Mark sequences whose SEED equals eos as already finished. Gen-1
    # models use token 0 as both <bos> input and <eos> output, so they
    # set this False.
    init_finished: bool = True
    # lax.scan unroll factor for the decode loop. Re-measured on v5e
    # 2026-08-17 (bf16 + DecodeKV layout): unroll=1 beats 2 and 4 at
    # beam 5 width 320 (162.2 / 149.5 / 159.7 captions/s) — the r01
    # +17% for unroll=4 predated the layout/dtype fixes.
    scan_unroll: int = 1
    # int8 context-K/V storage (QuantDecodeKV): halves the dominant
    # HBM stream of decode at ~0.5% RMS K/V error — captions may
    # differ from exact bf16 decoding (see ops/attention.py).
    quantize_kv: bool = False
    # int8 adaptive-softmax word tables (ops/adaptive.py QuantTable):
    # halves the ~100 MB/step head-table stream at ~0.4% RMS logit
    # error — selection can differ near ties, so opt-in like
    # quantize_kv; the exact path stays the default.
    quantize_head: bool = False
    # Stop the decode loop as soon as every sequence has emitted eos
    # (lax.while_loop instead of a fixed-length scan). Identical
    # outputs — finished rows already emit pad — but wall-clock
    # proportional to the LONGEST caption instead of max_len. The
    # reference compacts finished rows the same way
    # (transformer_flattened.py:312-319). Off for fixed-work benches.
    early_exit: bool = False
    # Gen-1 reference beam semantics (CaptionModel.py:82-93): a beam
    # that emits eos is HARVESTED into a done list (snapshot of its
    # tokens + raw score) and its live slot's score drops to -1e9 so
    # the slot keeps decoding but never wins; still-live beams are
    # harvested at the final step. Ranking uses length_penalty over
    # the done list (the reference ranks by raw sum — pass 0.0).
    # False = freeze-in-slot semantics (finished beams emit pad).
    harvest_finished: bool = False


def generate(step_fn: Callable, init_caches, seed: jax.Array,
             config: GenerationConfig, rng: Optional[jax.Array] = None
             ) -> Tuple[jax.Array, jax.Array]:
    """Greedy / top-k sampled generation over a full-vocab step_fn.

    step_fn(token_t [B], step_idx, caches) -> (log_probs [B, V], caches)
    seed: [B] first input token (<s>).
    Returns (token_ids [B, max_len+1] incl. seed, log_probs [B, max_len]).

    Thin adapter over `generate_candidates` (the single decode-loop
    implementation): the per-row top-k of the full-vocab log-probs IS
    the candidate set.
    """

    def cand_step(tok, i, caches):
        lp, caches = step_fn(tok, i, caches)
        topk_lp, topk_idx = jax.lax.top_k(lp, config.sampling_topk)
        return topk_lp, topk_idx, caches

    return generate_candidates(cand_step, init_caches, seed, config,
                               rng)


def permute_rows(x: jax.Array, flat_src: jax.Array) -> jax.Array:
    """Row gather new[i] = x[flat_src[i]] as a one-hot matmul.

    TPU row gathers of large 3-D arrays lower to slow scalar-indexed
    DMA; a [N, N] one-hot matmul rides the MXU instead (measured the
    dominant saving of the beam body at width 320). Exact for floats:
    every product is v*1.0 or v*0.0 and each output row sums one
    nonzero term (HIGHEST precision keeps fp32 operands unsplit).
    """
    N = x.shape[0]
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.take(x, flat_src, axis=0)
    perm = jax.nn.one_hot(flat_src, N, dtype=x.dtype)
    y = jax.lax.dot_general(
        perm, x.reshape(N, -1), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype)
    return y.reshape(x.shape)


def permute_ring_rows(x: jax.Array, flat_src: jax.Array) -> jax.Array:
    """`permute_rows` over AXIS 1 of a ring-major [K-1, N, C] cache:
    new[k, n, :] = x[k, flat_src[n], :], as one batched one-hot
    matmul on the MXU (exact for floats, like permute_rows)."""
    N = x.shape[1]
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.take(x, flat_src, axis=1)
    perm = jax.nn.one_hot(flat_src, N, dtype=x.dtype)     # [N, M]
    y = jnp.einsum("nm,kmc->knc", perm, x,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=x.dtype)
    return y


def generate_candidates(step_fn: Callable, init_caches,
                        seed: jax.Array, config: GenerationConfig,
                        rng: Optional[jax.Array] = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """`generate` over a candidate-producing step_fn.

    step_fn(token_t [B], step_idx, caches) ->
        (cand_lp [B, k], cand_ids [B, k], caches)
    where the k candidates are the EXACT top-k of the full-vocab
    distribution (AdaptiveSoftmax.topk_log_prob) — sampling from them
    is identical to top-k sampling over materialized [B, V] log-probs,
    without the [B, V] matrix.
    """
    B = seed.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    tokens0 = jnp.full((B, config.max_len + 1), config.pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(seed)
    if config.init_finished:
        finished0 = seed == config.eos_id
    else:
        finished0 = jnp.zeros((B,), bool)

    def step_once(i, cur, finished, caches, key):
        topk_lp, topk_idx, caches = step_fn(cur, i, caches)
        topk_lp = topk_lp / config.sampling_temp
        key, sub = jax.random.split(key)
        if config.sampling_topk == 1:
            choice = jnp.zeros((B,), jnp.int32)
        else:
            choice = jax.random.categorical(sub, topk_lp, axis=-1)
        sel_lp = jnp.take_along_axis(
            topk_lp, choice[:, None], axis=1)[:, 0]
        sel_idx = jnp.take_along_axis(
            topk_idx, choice[:, None], axis=1)[:, 0]
        next_tok = jnp.where(finished, config.pad_id, sel_idx)
        # fp32 regardless of the step's compute dtype so the scan and
        # early-exit paths return identically-typed log-probs.
        out_lp = jnp.where(finished, 0.0, sel_lp).astype(jnp.float32)
        finished = finished | (next_tok == config.eos_id)
        return next_tok, out_lp, finished, caches, key

    if config.early_exit:
        lps0 = jnp.zeros((B, config.max_len), jnp.float32)

        def cond(carry):
            i, _, finished, _, _, _ = carry
            return (i < config.max_len) & ~jnp.all(finished)

        def wbody(carry):
            i, cur, finished, tokens, lps, (caches, key) = carry
            next_tok, out_lp, finished, caches, key = step_once(
                i, cur, finished, caches, key)
            tokens = jax.lax.dynamic_update_slice(
                tokens, next_tok[:, None], (0, i + 1))
            lps = jax.lax.dynamic_update_slice(
                lps, out_lp[:, None].astype(lps.dtype), (0, i))
            return (i + 1, next_tok, finished, tokens, lps,
                    (caches, key))

        (_, _, _, tokens, lps, _) = jax.lax.while_loop(
            cond, wbody,
            (jnp.int32(0), seed, finished0, tokens0, lps0,
             (init_caches, rng)))
        return tokens, lps

    def body(carry, i):
        cur, finished, caches, key = carry
        next_tok, out_lp, finished, caches, key = step_once(
            i, cur, finished, caches, key)
        return (next_tok, finished, caches, key), (next_tok, out_lp)

    (_, _, _, _), (toks, lps) = jax.lax.scan(
        body, (seed, finished0, init_caches, rng),
        jnp.arange(config.max_len), unroll=config.scan_unroll)
    tokens = tokens0.at[:, 1:].set(toks.T)
    return tokens, lps.T


def beam_combine(scores: jax.Array, rv: jax.Array, ri: jax.Array,
                 finished: jax.Array, B: int, K: int, pad_id: int
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One beam-search combine — the single implementation of the
    exactness-critical selection shared by `beam_search_candidates`
    and the continuous beam engine (generation/continuous.py).

    scores/finished [B*K]; rv/ri [B*K, K] per-row candidate
    log-probs/ids (exact top-K per row). A finished row contributes
    exactly one candidate: itself extended by pad at +0.0 (its other
    slots are dead at -1e9). Returns (new_scores [B*K], tok_flat
    [B*K], flat_src [B*K]) — the chosen continuation token per beam
    slot and the ancestry source row for cache/token reordering.
    """
    neg_inf = jnp.float32(-1e9)
    pad_vals = jnp.full((K,), neg_inf).at[0].set(0.0)
    rv = jnp.where(finished[:, None], pad_vals[None, :], rv)
    ri = jnp.where(finished[:, None], pad_id, ri)
    cand = (scores[:, None] + rv).reshape(B, K * K)
    top_scores, top_flat = jax.lax.top_k(cand, K)      # [B, K]
    src_beam = top_flat // K
    tok = jnp.take_along_axis(ri.reshape(B, K * K), top_flat, axis=1)
    flat_src = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
    return top_scores.reshape(-1), tok.reshape(-1), flat_src


def rank_beams(tokens: jax.Array, scores: jax.Array, pad_id: int,
               length_penalty: float) -> Tuple[jax.Array, jax.Array]:
    """Final best-first ordering by score / length**alpha (alpha=0
    ranks by raw summed log-prob, the Gen-1 reference rule). tokens
    [B, K, L+1], scores [B, K]; returns both reordered."""
    lengths = jnp.sum(tokens != pad_id, axis=-1).astype(jnp.float32)
    norm = scores / (jnp.maximum(lengths, 1.0) ** length_penalty)
    order = jnp.argsort(-norm, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    return tokens, jnp.take_along_axis(norm, order, axis=1)


def beam_search_candidates(step_fn: Callable, init_caches,
                           seed: jax.Array, config: GenerationConfig,
                           reorder_fn: Optional[Callable] = None
                           ) -> Tuple[jax.Array, jax.Array]:
    """Beam search over a candidate-producing step_fn — the single
    beam-loop implementation (`beam_search` adapts a full-vocab
    step_fn onto it).

    step_fn(token_t [B*K], step_idx, caches) ->
        (cand_lp [B*K, K], cand_ids [B*K, K], caches)
    with the K candidates the EXACT per-row top-K. Two-stage exact
    selection: the global top-K per batch item lives in the union of
    its rows' top-K, so the combine stage is a K*K-wide top_k instead
    of K*V — the flat [B, K*V] top_k was ~1.4 ms/step at width 320
    (benchmarks/topk_bench.py). Cache reorders default to
    `permute_rows` (one-hot matmul).

    config.harvest_finished switches to the Gen-1 reference's done-
    list semantics (CaptionModel.py:82-93): an eos-ending beam is
    snapshot into a per-item done list and its slot's score drops to
    -1e9 (the slot keeps stepping but never wins the combine, exactly
    like the reference's -1000); still-live beams are harvested when
    the loop ends. Default (False): finished beams freeze in their
    slot emitting pad.

    Returns (tokens [B, beam, max_len+1], scores [B, beam]),
    best-first by score / length**length_penalty.
    """
    B = seed.shape[0]
    K = config.beam_size
    L = config.max_len
    harvest = config.harvest_finished
    if reorder_fn is None:
        def reorder_fn(caches, flat_src):
            return jax.tree.map(
                lambda c: permute_rows(c, flat_src), caches)

    flat_seed = jnp.repeat(seed, K)
    tokens0 = jnp.full((B * K, L + 1), config.pad_id,
                       jnp.int32).at[:, 0].set(flat_seed)
    neg_inf = jnp.float32(-1e9)
    # Only beam 0 is live initially (all beams identical otherwise).
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), neg_inf)]),
        (B,))
    if config.init_finished:
        finished0 = flat_seed == config.eos_id
    else:
        finished0 = jnp.zeros((B * K,), bool)
    done0 = (jnp.full((B, K), neg_inf),
             jnp.full((B, K, L + 1), config.pad_id, jnp.int32))

    def merge_done(done, tokens, scores, mask):
        """Insert masked beams into the per-item top-K done list."""
        done_s, done_t = done
        cand_s = jnp.where(mask, scores, neg_inf).reshape(B, K)
        all_s = jnp.concatenate([done_s, cand_s], axis=1)   # [B, 2K]
        all_t = jnp.concatenate(
            [done_t, tokens.reshape(B, K, L + 1)], axis=1)
        s, j = jax.lax.top_k(all_s, K)
        t = jnp.take_along_axis(all_t, j[:, :, None], axis=1)
        return s, t

    def step_once(i, cur, scores, finished, tokens, caches, done):
        rv, ri, caches = step_fn(cur, i, caches)       # [B*K, K] x2
        scores, tok_flat, flat_src = beam_combine(
            scores, rv, ri, finished, B, K, config.pad_id)
        tokens = jnp.take(tokens, flat_src, axis=0)
        caches = reorder_fn(caches, flat_src)
        finished = finished[flat_src]
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok_flat[:, None], (0, i + 1))
        just_eos = (tok_flat == config.eos_id) & ~finished
        if harvest:
            done = merge_done(done, tokens, scores, just_eos)
            scores = jnp.where(just_eos, neg_inf, scores)
        finished = finished | just_eos
        return tok_flat, scores, finished, tokens, caches, done

    init = (flat_seed, scores0, finished0, tokens0, init_caches,
            done0)
    if config.early_exit:
        def cond(c):
            i = c[0]
            finished = c[3]
            return (i < L) & ~jnp.all(finished)

        def wbody(c):
            i = c[0]
            return (i + 1,) + step_once(i, *c[1:])

        (_, _, scores, finished, tokens, _, done) = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0),) + init)
    else:
        def body(carry, i):
            return step_once(i, *carry), None

        (_, scores, finished, tokens, _, done), _ = jax.lax.scan(
            body, init, jnp.arange(L), unroll=config.scan_unroll)

    if harvest:
        # Reference harvests still-live beams at the final step
        # (CaptionModel.py:86 `t == self.seq_length - 1`).
        scores, tokens = merge_done(done, tokens, scores, ~finished)
    else:
        tokens = tokens.reshape(B, K, -1)
        scores = scores.reshape(B, K)
    return rank_beams(tokens, scores, config.pad_id,
                      config.length_penalty)


def beam_search(step_fn: Callable, init_caches, seed: jax.Array,
                config: GenerationConfig,
                cache_batch_axis: int = 0,
                reorder_fn: Optional[Callable] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search over a FULL-VOCAB step_fn.

    step_fn(token_t [B*K], step_idx, caches) -> (log_probs [B*K, V],
    caches), operating on a flat [B*beam] batch; `init_caches` must
    already be sized for B*beam (tile the contexts/KV before calling).
    `cache_batch_axis` is the axis of every cache leaf that carries the
    flat batch (Gen-1 LSTM states are [layers, B, H] -> axis 1).

    reorder_fn(caches, flat_src) -> caches overrides the default
    gather-every-leaf ancestry reorder.

    Thin adapter over `beam_search_candidates` (the single beam-loop
    implementation): the per-row top-K of the full-vocab log-probs is
    an exact candidate set, so the K*K combine selects the same beams
    as the flat K*V top_k. Returns (tokens [B, beam, max_len+1],
    scores [B, beam]) sorted best-first.
    """
    K = config.beam_size
    if reorder_fn is None:
        def reorder_fn(caches, flat_src):
            return jax.tree.map(
                lambda c: jnp.take(c, flat_src, axis=cache_batch_axis),
                caches)

    def cand_step(tok, i, caches):
        lp, caches = step_fn(tok, i, caches)           # [B*K, V]
        v, idx = jax.lax.top_k(lp, K)
        return v, idx.astype(jnp.int32), caches

    return beam_search_candidates(cand_step, init_caches, seed,
                                  config, reorder_fn=reorder_fn)
