"""Exact speculative greedy decoding (draft-and-verify).

Semantics-preserving accelerator for greedy decode: a cheap DRAFTER
proposes the next `spec_k - 1` tokens, one chunked decoder forward
VERIFIES them (the dynamic-conv decoder has no self-attention, so a
k-token causal chunk step costs barely more HBM traffic than a single
step — the context-K/V and weight streams dominate and are read once
per chunk either way), and the longest verified prefix plus one
corrected token is committed. Output is IDENTICAL to token-by-token
greedy decoding (`generator.generate` with sampling_topk=1): every
committed token is the argmax given its true prefix, and at least one
token commits per iteration.

The default drafter is prompt-lookup / n-gram copy from the article's
BPE ids — news captions copy long entity spans from their articles
(the reference's whole pointer family exists because of this,
/root/reference/ttl/tell/models/transformer_pointer.py:27-313), so
article continuation is a high-acceptance draft source with zero
model cost. Bad drafts only cost speed, never correctness.

The reference has no analog (its generation is a per-token Python
loop, /root/reference/ttl/tell/models/transformer_flattened.py:240-328);
this is a beyond-parity TPU feature.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from news_image_caption_tpu.generation.generator import GenerationConfig


def write_rows(b: jax.Array, vals: jax.Array,
               starts: jax.Array) -> jax.Array:
    """Per-row dynamic-offset write: b[r, starts[r]:starts[r]+k] =
    vals[r] (vmapped dynamic_update_slice)."""
    return jax.vmap(
        lambda row, v, s: jax.lax.dynamic_update_slice(row, v, (s,))
    )(b, vals, starts)


def greedy_verify(ids: jax.Array, drafts, finished: jax.Array,
                  pos: jax.Array, limit,
                  eos_id: int) -> Tuple[jax.Array, jax.Array]:
    """Commit counts for one verified greedy chunk — the single
    implementation of the exactness-critical rule shared by
    `speculative_greedy` and the continuous-batching engine
    (generation/continuous.py).

    ids [B, k]: chunk argmax outputs (output t = greedy next token
    given chunk inputs 0..t); drafts [B, k-1] or None (k = 1);
    limit: max outputs per row (scalar or [B]).

    Output t is valid iff drafts 0..t-1 all matched; the first
    mismatching output is the CORRECTED token (computed from verified
    inputs), so commits = matches + 1 — truncated at the first
    committed eos and the per-row limit; finished rows commit 0.
    Returns (m [B] int32, committed_eos [B] bool).
    """
    if drafts is not None and drafts.shape[1] > 0:
        n_match = jnp.sum(
            jnp.cumprod((ids[:, :-1] == drafts).astype(jnp.int32),
                        axis=1), axis=1)
        m = n_match + 1                                # [B] in 1..k
    else:
        m = jnp.ones_like(pos)
    is_eos = ids == eos_id
    first_eos = jnp.argmax(is_eos, axis=1)
    has_eos = jnp.any(is_eos, axis=1)
    m = jnp.where(has_eos, jnp.minimum(m, first_eos + 1), m)
    m = jnp.minimum(m, limit - pos)
    m = jnp.where(finished, 0, m)
    committed_eos = has_eos & (first_eos < m)
    return m, committed_eos


def commit_conv_caches(caches: List[jax.Array], hs: List[jax.Array],
                       m: jax.Array) -> List[jax.Array]:
    """Advance shifted-copy conv histories by each row's verified prefix.

    caches[l]: [B, K-1, C] (oldest first); hs[l]: [B, k, C] chunk
    conv-input activations (from `DynamicConvDecoder.step_chunk`);
    m: [B] int32 in [0, k] — number of chunk inputs committed per row.

    new_cache[l][b] = last K-1 rows of concat(cache[b], hs[l][b, :m[b]])
    — exactly the history k sequential `step` calls over the committed
    inputs would have left.
    """
    new = []
    for cache, h in zip(caches, hs):
        B, km1, _ = cache.shape
        if km1 == 0:  # pointwise (K=1) layer: no history
            new.append(cache)
            continue
        ext = jnp.concatenate([cache, h.astype(cache.dtype)], axis=1)
        idx = m[:, None] + jnp.arange(km1, dtype=jnp.int32)[None, :]
        new.append(jnp.take_along_axis(ext, idx[:, :, None], axis=1))
    return new


def ngram_drafts(source: jax.Array, tokens: jax.Array, pos: jax.Array,
                 k_draft: int, n: int = 2, pad_id: int = 1) -> jax.Array:
    """Prompt-lookup drafting: continue the generated suffix from its
    first occurrence in `source`.

    source: [B, S] token ids to draft from (e.g. article BPE ids);
    tokens: [B, L] committed token buffer (tokens[b, pos[b]] is the
    last committed token); pos: [B]. Returns drafts [B, k_draft] —
    the k_draft source tokens following the first position where
    source matches the last min(n, pos+1) committed tokens; pad_id
    where no match exists or the match runs off the end.
    """
    B, S = source.shape
    offs = pos[:, None] - (n - 1) + jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = offs >= 0                                     # [B, n]
    offs_c = jnp.clip(offs, 0, tokens.shape[1] - 1)
    last = jnp.take_along_axis(tokens, offs_c, axis=1)    # [B, n]
    M = S - n + 1
    if M <= 0:
        return jnp.full((B, k_draft), pad_id, jnp.int32)
    # win[b, s, j] = source[b, s + j] for s in 0..M-1
    win = jnp.stack([source[:, j:j + M] for j in range(n)], axis=-1)
    match = jnp.all((win == last[:, None, :]) | ~valid[:, None, :],
                    axis=-1)                              # [B, M]
    has = jnp.any(match, axis=1)
    s = jnp.argmax(match, axis=1)                         # first match
    didx = s[:, None] + n + jnp.arange(k_draft, dtype=jnp.int32)[None, :]
    drafts = jnp.take_along_axis(source, jnp.clip(didx, 0, S - 1), axis=1)
    return jnp.where(has[:, None] & (didx < S), drafts,
                     pad_id).astype(jnp.int32)


def speculative_greedy(
    chunk_fn: Callable, commit_fn: Callable, init_caches,
    seed: jax.Array, config: GenerationConfig, spec_k: int,
    draft_fn: Callable, collect_flags: bool = False,
) -> Tuple[jax.Array, ...]:
    """Greedy generation via draft-and-verify; outputs match
    `generator.generate(..., sampling_topk=1)` exactly.

    chunk_fn(tokens [B, spec_k], pos [B], caches) ->
        (log_probs [B, spec_k], argmax_ids [B, spec_k], aux)
      position t's output must be the greedy next token given chunk
      inputs 0..t (DynamicConvDecoder.step_chunk).
    commit_fn(caches, aux, m [B]) -> caches  — advance each row's
      decode state by its m committed chunk inputs.
    draft_fn(tokens, pos, finished) -> drafts [B, spec_k - 1].

    Returns (tokens [B, max_len+1], log_probs [B, max_len], n_chunks)
    — n_chunks is the number of verification forwards executed (the
    wall-clock unit; tokens-per-chunk = mean acceptance + 1).

    collect_flags=True: chunk_fn returns a 4th array [B, spec_k] of
    per-position bools (e.g. the pointer family's copied flags);
    committed positions' flags are collected (False padding) and
    returned as (tokens, log_probs, flags [B, max_len], n_chunks).
    """
    B = seed.shape[0]
    L = config.max_len
    k = spec_k
    if k < 2:
        raise ValueError("spec_k must be >= 2 (1 draft minimum)")
    buf = L + k + 1
    tokens0 = jnp.full((B, buf), config.pad_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(seed)
    lps0 = jnp.zeros((B, buf - 1), jnp.float32)
    pos0 = jnp.zeros((B,), jnp.int32)
    if config.init_finished:
        finished0 = seed == config.eos_id
    else:
        finished0 = jnp.zeros((B,), bool)

    # Without collect_flags the carry holds a 1-column dummy so the
    # non-flag callers (flagship/Gen-2/tgnc) pay no per-chunk
    # dynamic-offset write for flags they never read.
    flags0 = jnp.zeros((B, buf - 1 if collect_flags else 1), bool)

    def cond(c):
        _, _, _, pos, finished, _, _ = c
        return jnp.any(~finished & (pos < L))

    def body(c):
        tokens, lps, flags, pos, finished, caches, n_chunks = c
        cur = jnp.take_along_axis(tokens, pos[:, None], axis=1)  # [B,1]
        drafts = draft_fn(tokens, pos, finished)          # [B, k-1]
        inp = jnp.concatenate([cur, drafts], axis=1)      # [B, k]
        if collect_flags:
            lp_c, ids, aux, fl = chunk_fn(inp, pos, caches)
        else:
            lp_c, ids, aux = chunk_fn(inp, pos, caches)
        m, committed_eos = greedy_verify(ids, drafts, finished, pos,
                                         L, config.eos_id)
        arange_k = jnp.arange(k, dtype=jnp.int32)[None, :]
        live = arange_k < m[:, None]
        out_toks = jnp.where(live, ids, config.pad_id)
        out_lps = jnp.where(live, lp_c, 0.0)
        # Positions beyond each row's frontier are pad, so the masked
        # tail writes are no-ops; buf = L + k + 1 keeps the window
        # in-bounds at pos = L - 1.
        tokens = write_rows(tokens, out_toks, pos + 1)
        lps = write_rows(lps, out_lps.astype(lps.dtype), pos)
        if collect_flags:
            flags = write_rows(flags, jnp.where(live, fl, False), pos)
        caches = commit_fn(caches, aux, m)
        pos = pos + m
        finished = finished | committed_eos | (pos >= L)
        return tokens, lps, flags, pos, finished, caches, n_chunks + 1

    tokens, lps, flags, _, _, _, n_chunks = jax.lax.while_loop(
        cond, body,
        (tokens0, lps0, flags0, pos0, finished0, init_caches,
         jnp.int32(0)))
    if collect_flags:
        return tokens[:, :L + 1], lps[:, :L], flags[:, :L], n_chunks
    return tokens[:, :L + 1], lps[:, :L], n_chunks
