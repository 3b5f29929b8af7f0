"""Continuous batching: slot-based decode with mid-flight refill.

Beyond-reference serving capability (the reference decodes fixed
request batches end-to-end, tasks/captioner.py:146-...; a straggler
caption holds its whole batch). Here the decoder runs over a fixed
pool of W slots; requests stream in, each slot decodes its own
caption at its own position, and a slot that finishes is harvested
and refilled from the queue WITHOUT stopping the other slots —
utilization tracks offered load instead of the slowest caption.

TPU-first shape discipline: the slot pool is a static [W, ...] state
pytree; a jitted `chunk` dispatch advances every slot `inner_steps`
decode steps (one host round-trip per dispatch, amortizing the
tunnel/PCIe latency exactly like the steady-state bench dispatch);
insertion is a jitted per-slot `at[slot].set` donation (XLA updates
in place). Per-slot positions ride the same per-row machinery the
speculative decoder uses (DynamicConvDecoder.step_chunk: per-row
start positions over shifted-copy conv caches, commit_conv_caches:
per-row history advance), so with spec_k >= 2 each slot ALSO decodes
speculatively (prompt-lookup drafts from its own article ids) —
continuous batching and speculative decoding compose.

Two engines over one host-side pool (`_SlotPool`):
- `ContinuousBatcher` — greedy (optionally speculative) decode; each
  harvested caption is token-identical to `model.generate(...,
  sampling_topk=1)` run alone on that request.
- `ContinuousBeamBatcher` — EXACT beam search; each harvested
  (tokens, scores) is identical to standalone
  `TransformerFlattened.generate_beam`.
Both tested in tests/test_continuous.py.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from news_image_caption_tpu.generation.generator import GenerationConfig
from news_image_caption_tpu.generation.speculative import (
    commit_conv_caches, greedy_verify, ngram_drafts, write_rows)

__all__ = ["SlotState", "ContinuousBatcher",
           "BeamSlotState", "ContinuousBeamBatcher"]


class _SlotPool:
    """Shared host-side machinery of both continuous engines: the
    request queue, slot bookkeeping, per-request failure isolation,
    admission control, and the refill/dispatch/harvest skeleton.

    Subclasses provide the device side: `reset()` builds the state
    pytree (and must call `_reset_bookkeeping`), `_insert_slot(slot,
    kvs1, extra)` grafts one prepped request, `_dispatch_chunk()`
    advances every slot `inner_steps` steps and stashes a HOST VIEW
    (small, freshly-computed device arrays — finished flags + result
    rows) in `self._pending`, `_harvest(view)` turns a host view into
    {request_id: results}.

    Harvest is PIPELINED with `harvest_lag` chunks of lag (default 1):
    `step()` keeps up to `harvest_lag` chunk dispatches in flight and
    blocks only on the OLDEST outstanding view, so the device->host
    round trip (the only per-chunk sync) overlaps with the next
    chunk(s)' device execution. A finished request is therefore
    returned `harvest_lag` `step()`s after its slot finishes, and its
    slot sits frozen for those chunks — the win is that the decode
    stream never stalls on the host fetch. Lag 1 already hides the
    fetch on locally-attached hosts (micro-seconds); on high-RTT
    links (remote/tunneled accelerators) the fetch latency can exceed
    a whole chunk's device time, and deeper lag keeps ~lag fetches in
    flight so steady-state wall approaches max(chunk device time,
    RTT / lag) — trade it against occupancy (frozen slots) via
    `stats()['occupancy']`. The view arrays are sliced/cast INSIDE
    the chunk jit so they can never alias the donated slot state
    (fetching a donated buffer raises).
    """

    def __init__(self, params, config: GenerationConfig, n_slots: int,
                 inner_steps: int, max_queue: Optional[int],
                 harvest_lag: int = 1):
        if n_slots < 1:
            raise ValueError("n_slots must be >= 1")
        if inner_steps < 1:
            raise ValueError("inner_steps must be >= 1")
        if harvest_lag < 1:
            raise ValueError("harvest_lag must be >= 1")
        self.harvest_lag = harvest_lag
        self.params = params
        self.config = config
        self.W = n_slots
        self.inner_steps = inner_steps
        # Admission bound for callers that poll `backlog` (the serving
        # loop): beyond ~2 refills of queued work there is no
        # throughput benefit, only held memory.
        self.max_queue = (2 * n_slots if max_queue is None
                          else max_queue)
        self._queue: deque = deque()
        self._slot_req: List[Optional[int]] = [None] * n_slots
        self._next_id = 0
        self._failed: Dict[int, Exception] = {}
        self.n_chunks = 0          # device dispatches

    # -- bookkeeping -----------------------------------------------------

    def _reset_bookkeeping(self) -> None:
        self._queue.clear()
        self._slot_req = [None] * self.W
        self._failed.clear()
        self._pending = deque()    # in-flight host views, oldest first

    @staticmethod
    def _start_host_copy(view) -> None:
        """Begin the device->host transfer of a view without blocking;
        `_harvest`'s jax.device_get then finds the bytes already in
        flight (or local). Best-effort — backends without
        copy_to_host_async just pay the fetch at harvest, which is
        still overlapped with the next chunk's execution."""
        for leaf in jax.tree.leaves(view):
            try:
                leaf.copy_to_host_async()
            except Exception:
                return

    def _enqueue(self, request: Dict[str, Any], extra: tuple) -> int:
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, request, extra))
        return rid

    def _check_limit(self, max_len: Optional[int]) -> int:
        limit = self.config.max_len if max_len is None else max_len
        if not 0 < limit <= self.config.max_len:
            raise ValueError(f"max_len {limit} outside (0, "
                             f"{self.config.max_len}]")
        return limit

    @property
    def backlog(self) -> int:
        """Queued requests not yet in a slot. Admission control:
        callers stop feeding `submit` while backlog >= max_queue
        (staged features are real device memory)."""
        return len(self._queue)

    @property
    def idle(self) -> bool:
        """True when nothing is queued and no slot is decoding."""
        return (not self._queue
                and all(r is None for r in self._slot_req))

    def drain_failed(self) -> Dict[int, Exception]:
        """Requests that failed prep/insert (malformed shapes etc.)
        since the last drain — callers answer these as errors."""
        out, self._failed = self._failed, {}
        return out

    def stats(self) -> Dict[str, Any]:
        """Engine telemetry snapshot (host-side counters only — no
        device sync). Served by the worker's `_stats` job RPC."""
        return {
            "engine": type(self).__name__,
            "slots": self.W,
            "inner_steps": self.inner_steps,
            "harvest_lag": self.harvest_lag,
            "views_in_flight": len(self._pending),
            "busy_slots": sum(r is not None for r in self._slot_req),
            "backlog": self.backlog,
            "max_queue": self.max_queue,
            "n_chunks": self.n_chunks,
        }

    # -- refill / dispatch / harvest skeleton -----------------------------

    def _fill(self) -> None:
        for slot in [s for s, r in enumerate(self._slot_req)
                     if r is None]:
            if not self._queue:
                break
            rid, request, extra = self._queue.popleft()
            try:
                kvs1 = self._prep(self.params, request)
                lead = {leaf.shape[0] for leaf in jax.tree.leaves(kvs1)
                        if hasattr(leaf, "shape") and leaf.ndim > 0}
                if lead != {1}:
                    raise ValueError(
                        f"continuous batching takes B=1 requests; "
                        f"this request prepped KV with leading dims "
                        f"{lead} (split batched jobs into per-row "
                        f"requests)")
                sized_now = False
                if self.state.kvs is None:
                    # The FIRST successfully-inserted request sizes
                    # the W-slot KV pool (zeros elsewhere; empty slots
                    # stay frozen) and thereby pins the pool's context
                    # shapes — later requests with different shapes
                    # fail alone via drain_failed. Serving pins the
                    # canonical shapes up front with the warmup dummy
                    # (serving/worker.py::_attach_continuous).
                    self.state = self.state._replace(kvs=jax.tree.map(
                        lambda one: jnp.zeros(
                            (self.W,) + one.shape[1:], one.dtype),
                        kvs1))
                    sized_now = True
                try:
                    self._insert_slot(slot, kvs1, extra)
                except Exception:
                    if sized_now:
                        # Never let a malformed request dictate the
                        # pool's KV shapes — well-formed requests must
                        # still size it on their turn.
                        self.state = self.state._replace(kvs=None)
                    raise
            except Exception as e:   # malformed request: fail IT, not
                self._failed[rid] = e  # the engine (shape errors raise
                continue               # at trace time, pre-donation)
            self._slot_req[slot] = rid

    def step(self) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Refill free slots, dispatch one jitted chunk
        (`inner_steps` decode steps for every slot), then harvest the
        PREVIOUS chunk's finished slots (lag-1 pipeline — see class
        docstring). Returns {request_id: results} for captions
        completed by this call.

        Failed prep/inserts never raise here — they land in
        `drain_failed()`. A failed CHUNK dispatch raises after
        `reset()` (donated state: in-flight work is lost; the caller
        fails pending requests and keeps serving)."""
        self._fill()
        dispatched = False
        if any(r is not None for r in self._slot_req):
            try:
                self._dispatch_chunk()
            except Exception:
                # The dispatch consumed the donated state buffers;
                # rebuild a fresh pool so the engine survives
                # device-level errors.
                self.reset()
                raise
            self.n_chunks += 1
            dispatched = True
        # Block on the oldest view(s) only once `harvest_lag` chunks
        # are in flight; with nothing dispatched (all slots empty)
        # flush every outstanding view.
        keep = self.harvest_lag - 1 if dispatched else 0
        out: Dict[int, Any] = {}
        while len(self._pending) > keep:
            out.update(self._harvest(self._pending.popleft()))
        return out

    def run(self) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Drive `step()` until the queue and every slot drain;
        returns everything decoded by this call. (A long-running
        server uses `step()` directly and owns result routing — the
        engine holds no result history.)"""
        results: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        while not self.idle:
            results.update(self.step())
        # The step that freed the last slot also dispatched a chunk,
        # so up to harvest_lag-1 views may remain in flight; their
        # owners are all harvested already (the stale-view guard
        # would skip them) — drop them to release the device arrays.
        self._pending.clear()
        return results


class SlotState(NamedTuple):
    """Fixed-shape device state for a W-slot greedy decode pool."""

    tokens: jax.Array    # [W, L + k + 1] int32, row r = slot r's caption
    lps: jax.Array       # [W, L + k] fp32 per-token log-probs
    pos: jax.Array       # [W] int32 tokens committed (incl. seed = 0)
    finished: jax.Array  # [W] bool — True: done or empty (commits 0)
    limit: jax.Array     # [W] int32 per-request length cap (<= max_len)
    kvs: Any             # per-layer context K/V, batch axis 0 = slot
    caches: Any          # per-layer shifted-copy conv histories [W, K-1, C]
    source: jax.Array    # [W, S] int32 draft source ids (spec mode)
    key: jax.Array       # [W, 2] uint32 per-slot PRNG chain (sampling)
    flags: jax.Array     # [W, L + k] bool per-token flags (pointer
                         # family's copied markers; [W, 1] dummy off)


class ContinuousBatcher(_SlotPool):
    """Greedy (optionally speculative) slot engine around three
    jitted kernels (prep / insert / chunk). Build one per worker via
    `for_flattened` (the flagship serving model) / `for_gen2`, or the
    generic constructor for any model exposing the chunk/commit
    protocol of generation/speculative.py.

    prep_fn(params, request)            -> kvs for ONE request (B=1)
    chunk_fn(params, toks [W,k], pos, kvs, caches, aux) ->
        (lp, ids, hs) — position t's output = greedy next token given
        chunk inputs 0..t (DynamicConvDecoder.step_chunk contract)
    commit_fn(caches, hs, m [W])        -> caches advanced per row
    init_caches_fn(W)                   -> W-slot conv caches
    prepare_fn(params) -> aux           — optional per-params
        precomputation (e.g. int8 head tables), run ONCE at build /
        reset and passed to chunk_fn as a jit argument (never a
        closure constant: big literals choke remote compiles).
    """

    def __init__(self, params, prep_fn: Callable, chunk_fn: Callable,
                 commit_fn: Callable, init_caches_fn: Callable,
                 config: GenerationConfig, n_slots: int,
                 inner_steps: int = 8, spec_k: int = 1,
                 source_len: int = 1, ngram_n: int = 2,
                 prepare_fn: Optional[Callable] = None,
                 max_queue: Optional[int] = None,
                 sample_step_fn: Optional[Callable] = None,
                 collect_flags: bool = False,
                 harvest_lag: int = 1):
        super().__init__(params, config, n_slots, inner_steps,
                         max_queue, harvest_lag=harvest_lag)
        # collect_flags: chunk_fn returns a 4th [W, k] bool array of
        # per-position flags (the pointer family's copied markers);
        # harvest then yields (tokens, lps, flags) triples.
        self.collect_flags = collect_flags
        if spec_k < 1:
            raise ValueError("spec_k must be >= 1")
        self._sampling = config.sampling_topk > 1
        if self._sampling and spec_k > 1:
            raise ValueError("speculative decoding is greedy-only; "
                             "sampling_topk > 1 requires spec_k == 1")
        if self._sampling and collect_flags:
            raise ValueError("collect_flags is greedy-only")
        if self._sampling and sample_step_fn is None:
            raise ValueError("sampling_topk > 1 needs a "
                             "sample_step_fn (per-row-position top-k "
                             "candidate step)")
        self.k = spec_k
        self.source_len = source_len
        self.ngram_n = ngram_n
        self._init_caches_fn = init_caches_fn
        # utilization accounting (greedy engine only)
        self.n_committed = 0       # tokens committed across slots
        self.n_slot_steps = 0      # W * inner_steps per dispatch

        self._buf = config.max_len + spec_k + 1
        self._prep = jax.jit(prep_fn)
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))
        impl = (self._sampling_chunk_impl(sample_step_fn)
                if self._sampling
                else self._chunk_impl(chunk_fn, commit_fn))
        self._chunk = jax.jit(impl, donate_argnums=(1,))
        self.aux = (None if prepare_fn is None
                    else jax.jit(prepare_fn)(params))
        self.reset()

    def reset(self) -> None:
        """Fresh slot state (same shapes -> jit caches stay warm).
        Drops everything in flight: queued requests and occupied
        slots are abandoned without results — callers fail them
        (`serving/worker.py` error-replies pending jobs). The
        recovery path for a failed chunk dispatch: `_chunk` donates
        the state buffers, so after a device-level error the old
        state is unusable either way."""
        L, W = self.config.max_len, self.W
        self.state = SlotState(
            tokens=jnp.full((W, self._buf), self.config.pad_id,
                            jnp.int32),
            lps=jnp.zeros((W, self._buf - 1), jnp.float32),
            pos=jnp.zeros((W,), jnp.int32),
            finished=jnp.ones((W,), bool),      # empty slots commit 0
            limit=jnp.full((W,), L, jnp.int32),
            kvs=None,                          # sized on first insert
            caches=self._init_caches_fn(W),
            source=jnp.full((W, self.source_len), self.config.pad_id,
                            jnp.int32),
            key=jnp.zeros((W, 2), jnp.uint32),
            flags=jnp.zeros(
                (W, self._buf - 1 if self.collect_flags else 1),
                bool),
        )
        self._reset_bookkeeping()

    # -- jitted kernels ------------------------------------------------

    def _insert_impl(self, state: SlotState, slot: jax.Array,
                     kvs1, source_row: jax.Array,
                     limit: jax.Array,
                     key_row: jax.Array) -> SlotState:
        cfg = self.config
        kvs = jax.tree.map(lambda big, one: big.at[slot].set(one[0]),
                           state.kvs, kvs1)
        # dtype-matched zero: cache trees mix floats with e.g. the
        # pointer family's bool copied table
        caches = jax.tree.map(
            lambda c: c.at[slot].set(jnp.zeros((), c.dtype)),
            state.caches)
        tokens = state.tokens.at[slot].set(cfg.pad_id)
        tokens = tokens.at[slot, 0].set(cfg.bos_id)
        return state._replace(
            tokens=tokens,
            lps=state.lps.at[slot].set(0.0),
            pos=state.pos.at[slot].set(0),
            finished=state.finished.at[slot].set(
                cfg.init_finished and cfg.bos_id == cfg.eos_id),
            limit=state.limit.at[slot].set(limit),
            kvs=kvs, caches=caches,
            source=state.source.at[slot].set(source_row),
            key=state.key.at[slot].set(key_row),
            flags=state.flags.at[slot].set(False))

    def _chunk_impl(self, chunk_fn: Callable, commit_fn: Callable):
        cfg = self.config
        k = self.k

        def run(params, state: SlotState, aux):
            def body(carry, _):
                st, committed = carry
                cur = jnp.take_along_axis(st.tokens, st.pos[:, None],
                                          axis=1)             # [W, 1]
                if k > 1:
                    drafts = ngram_drafts(st.source, st.tokens,
                                          st.pos, k - 1,
                                          n=self.ngram_n,
                                          pad_id=cfg.pad_id)  # [W,k-1]
                    inp = jnp.concatenate([cur, drafts], axis=1)
                else:
                    drafts = None
                    inp = cur
                if self.collect_flags:
                    lp_c, ids, hs, fl = chunk_fn(params, inp, st.pos,
                                                 st.kvs, st.caches,
                                                 aux)
                else:
                    lp_c, ids, hs = chunk_fn(params, inp, st.pos,
                                             st.kvs, st.caches, aux)
                # The shared exactness-critical commit rule
                # (speculative.py::greedy_verify), with the per-row
                # request limit in place of the global max_len.
                m, committed_eos = greedy_verify(
                    ids, drafts, st.finished, st.pos, st.limit,
                    cfg.eos_id)
                live = (jnp.arange(k, dtype=jnp.int32)[None, :]
                        < m[:, None])
                out_toks = jnp.where(live, ids, cfg.pad_id)
                out_lps = jnp.where(live, lp_c, 0.0)
                tokens = write_rows(st.tokens, out_toks, st.pos + 1)
                lps = write_rows(st.lps,
                                 out_lps.astype(st.lps.dtype), st.pos)
                flags = st.flags
                if self.collect_flags:
                    flags = write_rows(flags, jnp.where(live, fl,
                                                        False), st.pos)
                caches = commit_fn(st.caches, hs, m)
                pos = st.pos + m
                finished = (st.finished | committed_eos
                            | (pos >= st.limit))
                st = st._replace(tokens=tokens, lps=lps, pos=pos,
                                 finished=finished, caches=caches,
                                 flags=flags)
                return (st, committed + jnp.sum(m)), None

            (state, committed), _ = jax.lax.scan(
                body, (state, jnp.int32(0)), None,
                length=self.inner_steps)
            return state, self._make_view(state, committed)

        return run

    def _make_view(self, state: SlotState, committed) -> dict:
        """Host view of one chunk's results: every array is a FRESH
        value (dtype cast / strict slice — the token/lp/flag buffers
        are over-allocated by spec_k), so fetching it after the next
        chunk donates `state` is safe."""
        L = self.config.max_len
        view = {"finished": state.finished.astype(jnp.uint8),
                "tokens": state.tokens[:, :L + 1],
                "lps": state.lps[:, :L],
                "committed": committed}
        if self.collect_flags:
            view["flags"] = state.flags[:, :L]
        return view

    def _sampling_chunk_impl(self, sample_step_fn: Callable):
        """Top-k SAMPLING body (the reference's own generation mode,
        transformer_flattened.py:240-328). Per-slot PRNG chains
        replicate `generate_candidates`' B=1 key schedule exactly
        (key, sub = split(key) per step; categorical(sub, lp[1, k]))
        — a harvested caption equals `model.generate(request,
        config, rng=<that request's key>)` token-for-token."""
        cfg = self.config
        k = cfg.sampling_topk

        def per_row_draw(sub, lp_row):
            # lp_row[None, :] mirrors the standalone B=1 logits shape
            # so the categorical consumes identical random bits.
            return jax.random.categorical(sub, lp_row[None, :])[0]

        def run(params, state: SlotState, aux):
            def body(carry, _):
                st, committed = carry
                cur = jnp.take_along_axis(
                    st.tokens, st.pos[:, None], axis=1)[:, 0]  # [W]
                lp_c, ids, caches = sample_step_fn(
                    params, cur, st.pos, st.kvs, st.caches, aux)
                lp_c = lp_c / cfg.sampling_temp
                split2 = jax.vmap(
                    lambda kk: jax.random.split(kk))(st.key)
                key_next, subs = split2[:, 0], split2[:, 1]
                choice = jax.vmap(per_row_draw)(subs, lp_c)
                sel_lp = jnp.take_along_axis(
                    lp_c, choice[:, None], axis=1)[:, 0]
                sel_idx = jnp.take_along_axis(
                    ids, choice[:, None], axis=1)[:, 0]
                live = ~st.finished
                next_tok = jnp.where(live, sel_idx, cfg.pad_id)
                out_lp = jnp.where(live, sel_lp, 0.0).astype(
                    jnp.float32)
                m = live.astype(jnp.int32)
                tokens = write_rows(st.tokens, next_tok[:, None],
                                    st.pos + 1)
                lps = write_rows(st.lps, out_lp[:, None], st.pos)
                pos = st.pos + m
                finished = (st.finished | (next_tok == cfg.eos_id)
                            | (pos >= st.limit))
                st = st._replace(tokens=tokens, lps=lps, pos=pos,
                                 finished=finished, caches=caches,
                                 key=key_next)
                return (st, committed + jnp.sum(m)), None

            (state, committed), _ = jax.lax.scan(
                body, (state, jnp.int32(0)), None,
                length=self.inner_steps)
            return state, self._make_view(state, committed)

        return run

    # -- host-side hooks ---------------------------------------------

    def submit(self, request: Dict[str, Any],
               source_row: Optional[np.ndarray] = None,
               max_len: Optional[int] = None,
               rng: Optional[Any] = None) -> int:
        """Queue one request (a B=1 batch dict for prep_fn). Returns a
        request id; the caption appears under that id in `step()`'s
        results once decoded (tokens match `model.generate` run alone
        on the request — greedy, or sampled with the same rng).
        source_row: [S] draft-source token ids (spec mode; defaults
        to pads = no drafts ever accepted).
        max_len: per-request length cap (<= config.max_len) — slots
        serving short-capped requests free up early. rng: per-request
        PRNG key for sampling mode (sampling_topk > 1); defaults to
        PRNGKey(request_id) — pass the key you would hand to
        `model.generate` to reproduce it exactly."""
        # Validate BEFORE enqueueing: a raising submit must not leave
        # a zombie queue entry behind (it would later fail at unpack
        # time under an id the caller never received).
        limit = self._check_limit(max_len)
        rid = self._enqueue(request, ())   # reserve the id (default
        key = (np.asarray(rng, np.uint32)  # rng is keyed on it)
               if rng is not None
               else np.asarray(jax.random.PRNGKey(rid), np.uint32))
        self._queue[-1] = (rid, request, (source_row, limit, key))
        return rid

    def _insert_slot(self, slot: int, kvs1, extra: tuple) -> None:
        source_row, limit, key = extra
        src = np.full((self.source_len,), self.config.pad_id,
                      np.int32)
        if source_row is not None:
            source_row = np.asarray(source_row, np.int32).ravel()
            n = min(self.source_len, source_row.shape[0])
            src[:n] = source_row[:n]
        self.state = self._insert(self.state, jnp.int32(slot), kvs1,
                                  jnp.asarray(src), jnp.int32(limit),
                                  jnp.asarray(key))

    def _dispatch_chunk(self) -> None:
        self.state, view = self._chunk(self.params, self.state,
                                       self.aux)
        self.n_slot_steps += self.W * self.inner_steps
        self._start_host_copy(view)
        # Snapshot slot->request as of THIS chunk: by harvest time a
        # slot may already be freed and refilled (its frozen row would
        # otherwise be mis-attributed to the new request).
        self._pending.append((list(self._slot_req), view))

    def _harvest(self, pending) -> Dict[int, Tuple[np.ndarray,
                                                   np.ndarray]]:
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        if pending is None:
            return out
        owners, view = pending
        view = jax.device_get(view)   # the step's ONLY blocking fetch
        self.n_committed += int(view["committed"])
        finished = view["finished"].astype(bool)
        for s, r in enumerate(owners):
            # Return slot s only if it STILL belongs to the request it
            # held when this chunk ran (rids are unique; a mismatch
            # means an earlier view already harvested it).
            if r is None or not finished[s] or self._slot_req[s] != r:
                continue
            res = (view["tokens"][s], view["lps"][s])
            if self.collect_flags:
                res = res + (view["flags"][s],)
            out[r] = res
            self._slot_req[s] = None
        return out

    @property
    def occupancy(self) -> float:
        """Committed tokens per slot-step dispatched (1.0 = every slot
        committed a token every inner step; spec mode can exceed 1)."""
        return (self.n_committed / self.n_slot_steps
                if self.n_slot_steps else 0.0)

    def stats(self) -> Dict[str, Any]:
        return {**super().stats(),
                "n_committed": self.n_committed,
                "occupancy": round(self.occupancy, 4),
                "spec_k": self.k,
                "sampling_topk": self.config.sampling_topk}

    # -- model adapters --------------------------------------------------

    @classmethod
    def for_flattened(cls, model, params,
                      config: GenerationConfig, n_slots: int,
                      inner_steps: int = 8, spec_k: int = 1,
                      source_len: int = 512, ngram_n: int = 2,
                      harvest_lag: int = 1) -> "ContinuousBatcher":
        """Engine over TransformerFlattened (the flagship serving
        model): per-request KV prep via `_decode_setup`, chunk steps
        via `DynamicConvDecoder.step_chunk` (per-row positions over
        shifted-copy caches), commits via `commit_conv_caches`."""
        from news_image_caption_tpu.models.decoder_flattened import \
            DynamicConvDecoder
        model._check_max_len(config)

        def prep_fn(p, request):
            return model._decode_setup(p, model._contexts(request),
                                       quantize_kv=config.quantize_kv)

        def chunk_fn(p, toks, pos, kvs, caches, aux):
            # aux = int8 head tables quantized ONCE at engine build
            # (prepare_fn below); None = exact tables read from p
            # inside step_chunk.
            return model.decoder.apply(
                p, toks, pos, kvs, caches, tables=aux,
                method=DynamicConvDecoder.step_chunk)

        def sample_step_fn(p, tok, pos, kvs, caches, aux):
            # per-row-position top-k candidates (sampling mode)
            return model.decoder.apply(
                p, tok, pos, kvs, caches, config.sampling_topk,
                tables=aux,
                method=DynamicConvDecoder.step_topk_pos)

        prepare_fn = ((lambda p: model._head_tables(p, config))
                      if config.quantize_head else None)
        return cls(params, prep_fn, chunk_fn, commit_conv_caches,
                   model.decoder.init_cache, config, n_slots,
                   inner_steps=inner_steps, spec_k=spec_k,
                   source_len=source_len, ngram_n=ngram_n,
                   prepare_fn=prepare_fn,
                   sample_step_fn=sample_step_fn,
                   harvest_lag=harvest_lag)

    @classmethod
    def for_pointer(cls, model, variables, config: GenerationConfig,
                    n_slots: int, inner_steps: int = 8,
                    spec_k: int = 1, source_len: int = 512,
                    ngram_n: int = 2,
                    harvest_lag: int = 1) -> "ContinuousBatcher":
        """Engine over TransformerPointer (entity gate + copy head).

        Results are (tokens, lps, copied_flags) triples. The copy
        machinery is per-slot state: raw article features /
        context ids / proper-noun relevance ride the kvs tree
        (inserted per slot like K/V), and the caches triple is
        (conv histories, entity KV cache, copied-token table). The
        chunk/commit math is the pointer's own `pointer_chunk` /
        `pointer_commit` — one implementation shared with
        generate_speculative. transformer_only_pointer (no entity
        head) has no copy gate: use `for_flattened` on its captioner.
        """
        from news_image_caption_tpu.models.decoder_flattened import \
            DynamicConvDecoder
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        if config.sampling_topk != 1:
            raise ValueError("the pointer engine is greedy-only "
                             "(sampling_topk must be 1)")
        if not model.use_entity_head:
            raise ValueError("transformer_only_pointer has no copy "
                             "gate; use for_flattened on "
                             "model.captioner with "
                             "variables['captioner']")
        dec = model.captioner.decoder
        model.captioner._check_max_len(config)

        def prep_fn(vars_, request):
            ctx = model.captioner._contexts(request)
            kvs = decode_kv_tree(dec.apply(
                vars_["captioner"], ctx,
                method=DynamicConvDecoder.precompute_kv))
            S = request["article_ids"].shape[1]
            mask = request.get("article_mask")
            if mask is None:   # tree leaves must exist to pool-size
                mask = jnp.zeros((1, S), bool)
            return {"kvs": kvs,
                    "article": jnp.asarray(request["article"]),
                    "article_mask": jnp.asarray(mask),
                    "context_ids": jnp.asarray(
                        request["article_ids"], jnp.int32),
                    "relevant": (jnp.asarray(
                        request["context_proper_masks"]) >= 1
                    ).astype(jnp.float32)}

        def chunk_fn(vars_, toks, pos, tree, caches, aux):
            return model.pointer_chunk(vars_, toks, pos, tree,
                                       caches, config.eos_id)

        def init_caches_fn(W):
            return (dec.init_cache(W),
                    model.entity_attn.init_cache(
                        W, config.max_len + max(spec_k, 1),
                        dtype=getattr(dec, "dtype", None)
                        or jnp.float32),
                    jnp.zeros((W, model.vocab_size), bool))

        return cls(variables, prep_fn, chunk_fn, model.pointer_commit,
                   init_caches_fn, config, n_slots,
                   inner_steps=inner_steps, spec_k=spec_k,
                   source_len=source_len, ngram_n=ngram_n,
                   collect_flags=True, harvest_lag=harvest_lag)

    @classmethod
    def for_tgnc(cls, model, variables, config: GenerationConfig,
                 n_slots: int, inner_steps: int = 8, spec_k: int = 1,
                 source_len: int = 512, ngram_n: int = 2,
                 harvest_lag: int = 1) -> "ContinuousBatcher":
        """Engine over TGNC's template-guided decoder: the per-request
        template logits (ClassificationHead over article+image) are
        computed once in prep and ride the kvs tree per slot; trunk +
        per-template-head conv caches share the shifted-copy commit.
        TGNC without use_template_decoder is a plain flattened model:
        use `for_flattened` on model.captioner."""
        from news_image_caption_tpu.models.tgnc import \
            TemplateGuidedDecoder
        from news_image_caption_tpu.ops.attention import decode_kv_tree
        if config.sampling_topk != 1:
            raise ValueError("the tgnc engine is greedy-only "
                             "(sampling_topk must be 1)")
        if not model.use_template_decoder:
            raise ValueError("this TGNC has no template decoder; use "
                             "for_flattened on model.captioner with "
                             "variables['captioner']")

        def prep_fn(vars_, request):
            contexts = model._contexts(request)
            tl = model.classifier.apply(
                vars_["classifier"], request["article"],
                request["image"])                     # [1, n]
            kvs = decode_kv_tree(model.tg_decoder.apply(
                vars_["decoder"], contexts,
                method=TemplateGuidedDecoder.precompute_kv))
            return {"kvs": kvs, "template_logits": tl}

        def chunk_fn(vars_, toks, pos, tree, caches, aux):
            return model.tg_decoder.apply(
                vars_["decoder"], toks, pos, tree["kvs"], caches,
                tree["template_logits"],
                method=TemplateGuidedDecoder.step_chunk)

        return cls(variables, prep_fn, chunk_fn, commit_conv_caches,
                   model.tg_decoder.init_cache, config, n_slots,
                   inner_steps=inner_steps, spec_k=spec_k,
                   source_len=source_len, ngram_n=ngram_n,
                   harvest_lag=harvest_lag)

    @classmethod
    def for_gen2(cls, model, params, config: GenerationConfig,
                 n_slots: int, inner_steps: int = 8, spec_k: int = 1,
                 source_len: int = 512, ngram_n: int = 2,
                 harvest_lag: int = 1) -> "ContinuousBatcher":
        """Engine over Gen2Captioner (final* OnlyDecoder family).

        Gen-2's chunk contract is even simpler than the flagship's:
        `Gen2Transformer.step_chunk` RETURNS the committed caches
        (self-attn K/V rows are masked by each row's pos, so adopting
        the chunk's writes is the commit and slot reuse needs no
        zeroing beyond the generic insert). The per-request article
        pad mask rides the kvs tree so it inserts per-slot like K/V.
        """
        from news_image_caption_tpu.models.gen2 import Gen2Transformer
        if config.sampling_topk != 1:
            raise ValueError("continuous batching is greedy-only "
                             "(sampling_topk must be 1)")
        module = model.module

        def prep_fn(p, request):
            kvs = module.apply(p, model._memory(request),
                               method=Gen2Transformer.precompute_kv)
            return {"kvs": kvs, "masks": model._src_masks(request)}

        def chunk_fn(p, toks, pos, tree, caches, aux):
            return module.apply(p, toks, pos, tree["kvs"], caches,
                                tree["masks"],
                                method=Gen2Transformer.step_chunk)

        def commit_fn(caches, hs, m):
            return hs   # stale rows masked by pos (step_chunk doc)

        def init_caches_fn(W):
            # +spec_k slots: a chunk at pos = max_len-1 writes through
            # pos + spec_k - 1 (tail past each row's commit is masked)
            return module.init_cache(W, config.max_len + spec_k)

        return cls(params, prep_fn, chunk_fn, commit_fn,
                   init_caches_fn, config, n_slots,
                   inner_steps=inner_steps, spec_k=spec_k,
                   source_len=source_len, ngram_n=ngram_n,
                   harvest_lag=harvest_lag)


class BeamSlotState(NamedTuple):
    """Fixed-shape device state for a W-slot beam-decode pool (K beam
    rows per slot; flat row r belongs to slot r // K)."""

    tokens: jax.Array    # [W*K, L+1] int32
    scores: jax.Array    # [W*K] fp32 summed log-probs
    pos: jax.Array       # [W] int32 decode steps taken by the slot
    finished: jax.Array  # [W*K] bool per beam row
    done: jax.Array      # [W] bool — slot frozen (harvest-ready/empty)
    limit: jax.Array     # [W] int32 per-request length cap
    kvs: Any             # per-layer context K/V, UNTILED: axis 0 = slot
    caches: Any          # per-layer shifted conv histories [W*K, K-1, C]


class ContinuousBeamBatcher(_SlotPool):
    """Continuous batching for EXACT beam search (the flagship's
    production decode mode): W slots of K beams each, refilled
    mid-flight. Each harvested result is token-identical to
    `TransformerFlattened.generate_beam` run alone on that request
    (default freeze-in-slot semantics + length-penalty ranking).

    Per-slot depth rides `DynamicConvDecoder.step_topk_pos` (per-row
    positions over shifted-copy caches; context K/V stay untiled and
    shared across each slot's beams, exactly like generate_beam); the
    combine and final ranking are the generator's own
    `beam_combine`/`rank_beams` — one implementation, no drift.
    """

    def __init__(self, model, params, config: GenerationConfig,
                 n_slots: int, inner_steps: int = 8,
                 max_queue: Optional[int] = None,
                 harvest_lag: int = 1):
        from news_image_caption_tpu.generation.generator import (
            beam_combine, permute_rows, rank_beams)
        from news_image_caption_tpu.models.decoder_flattened import \
            DynamicConvDecoder
        super().__init__(params, config, n_slots, inner_steps,
                         max_queue, harvest_lag=harvest_lag)
        model._check_max_len(config)
        if config.harvest_finished:
            raise ValueError("continuous beam implements the default "
                             "freeze-in-slot semantics (the Gen-1 "
                             "done-list mode is generate_beam-only)")
        self.model = model
        self.K = config.beam_size

        W, K, L = n_slots, self.K, config.max_len
        cfg = config

        def prep_fn(p, request):
            return model._decode_setup(p, model._contexts(request),
                                       quantize_kv=cfg.quantize_kv)

        self._prep = jax.jit(prep_fn)
        self.aux = (jax.jit(
            lambda p: model._head_tables(p, cfg))(params)
            if cfg.quantize_head else None)

        def insert(state: BeamSlotState, slot, kvs1,
                   limit) -> BeamSlotState:
            kvs = jax.tree.map(lambda big, one: big.at[slot].set(one[0]),
                               state.kvs, kvs1)
            caches = jax.tree.map(
                lambda c: jax.lax.dynamic_update_slice_in_dim(
                    c, jnp.zeros((K,) + c.shape[1:], c.dtype),
                    slot * K, axis=0), state.caches)
            row0 = slot * K
            tokens = jax.lax.dynamic_update_slice_in_dim(
                state.tokens,
                jnp.full((K, L + 1), cfg.pad_id,
                         jnp.int32).at[:, 0].set(cfg.bos_id),
                row0, axis=0)
            # Only beam 0 live initially (all beams identical else).
            scores = jax.lax.dynamic_update_slice_in_dim(
                state.scores,
                jnp.full((K,), -1e9, jnp.float32).at[0].set(0.0),
                row0, axis=0)
            fin0 = jnp.full(
                (K,), cfg.init_finished and cfg.bos_id == cfg.eos_id)
            finished = jax.lax.dynamic_update_slice_in_dim(
                state.finished, fin0, row0, axis=0)
            return state._replace(
                tokens=tokens, scores=scores, finished=finished,
                pos=state.pos.at[slot].set(0),
                done=state.done.at[slot].set(False),
                limit=state.limit.at[slot].set(limit),
                kvs=kvs, caches=caches)

        self._insert = jax.jit(insert, donate_argnums=(0,))

        def run(params, state: BeamSlotState, aux):
            def body(st: BeamSlotState, _):
                pos_rows = jnp.repeat(st.pos, K)          # [W*K]
                freeze = jnp.repeat(st.done, K)           # [W*K]
                cur = jnp.take_along_axis(
                    st.tokens, pos_rows[:, None], axis=1)[:, 0]
                rv, ri, new_caches = model.decoder.apply(
                    params, cur, pos_rows, st.kvs, st.caches, K,
                    beam=K, tables=aux,
                    method=DynamicConvDecoder.step_topk_pos)
                scores, tok_flat, flat_src = beam_combine(
                    st.scores, rv, ri, st.finished, W, K, cfg.pad_id)
                tokens = jnp.take(st.tokens, flat_src, axis=0)
                caches = jax.tree.map(
                    lambda c: permute_rows(c, flat_src), new_caches)
                finished = st.finished[flat_src]
                tokens = write_rows(tokens, tok_flat[:, None],
                                    pos_rows + 1)
                just_eos = (tok_flat == cfg.eos_id) & ~finished
                finished = finished | just_eos
                # Freeze done slots (harvest-pending/empty): their
                # tokens/scores/finished must not churn under the
                # combine's re-sorts.
                tokens = jnp.where(freeze[:, None], st.tokens, tokens)
                scores = jnp.where(freeze, st.scores, scores)
                finished = jnp.where(freeze, st.finished, finished)
                pos = jnp.where(st.done, st.pos, st.pos + 1)
                slot_fin = jnp.all(finished.reshape(W, K), axis=1)
                done = st.done | slot_fin | (pos >= st.limit)
                return st._replace(tokens=tokens, scores=scores,
                                   pos=pos, finished=finished,
                                   done=done, caches=caches), None

            state, _ = jax.lax.scan(body, state, None,
                                    length=self.inner_steps)
            # Host view: rank ALL W slots in-jit every chunk (trivial
            # vs the decode; a per-done-slot jit would re-dispatch
            # N_done times on the serving hot loop). rank_beams
            # computes fresh arrays, so the view never aliases the
            # donated state (lag-1 harvest fetches it after the next
            # chunk consumes `state`).
            rt, rs = rank_beams(state.tokens.reshape(W, K, L + 1),
                                state.scores.reshape(W, K),
                                cfg.pad_id, cfg.length_penalty)
            view = {"done": state.done.astype(jnp.uint8),
                    "tokens": rt, "scores": rs}
            return state, view

        self._chunk = jax.jit(run, donate_argnums=(1,))
        self.reset()

    def reset(self) -> None:
        """Fresh pool (same shapes -> jit caches warm); abandons all
        in-flight work — see ContinuousBatcher.reset."""
        W, K, L = self.W, self.K, self.config.max_len
        self.state = BeamSlotState(
            tokens=jnp.full((W * K, L + 1), self.config.pad_id,
                            jnp.int32),
            scores=jnp.full((W * K,), -1e9, jnp.float32),
            pos=jnp.zeros((W,), jnp.int32),
            finished=jnp.zeros((W * K,), bool),
            done=jnp.ones((W,), bool),          # empty slots frozen
            limit=jnp.full((W,), L, jnp.int32),
            kvs=None,
            caches=self.model.decoder.init_cache(W * K),
        )
        self._reset_bookkeeping()

    # -- host-side hooks ---------------------------------------------

    def submit(self, request: Dict[str, Any],
               max_len: Optional[int] = None) -> int:
        """Queue one B=1 request; `step()` eventually returns
        (tokens [beam, max_len+1], scores [beam]) under the returned
        id, best-first."""
        return self._enqueue(request, (self._check_limit(max_len),))

    def stats(self) -> Dict[str, Any]:
        return {**super().stats(), "beam_size": self.K}

    def _insert_slot(self, slot: int, kvs1, extra: tuple) -> None:
        (limit,) = extra
        self.state = self._insert(self.state, jnp.int32(slot), kvs1,
                                  jnp.int32(limit))

    def _dispatch_chunk(self) -> None:
        self.state, view = self._chunk(self.params, self.state,
                                       self.aux)
        self._start_host_copy(view)
        self._pending.append((list(self._slot_req), view))

    def _harvest(self, pending) -> Dict[int, Tuple[np.ndarray,
                                                   np.ndarray]]:
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        if pending is None:
            return out
        owners, view = pending
        view = jax.device_get(view)   # the step's ONLY blocking fetch
        done = view["done"].astype(bool)
        for s, r in enumerate(owners):
            # Same stale-view guard as ContinuousBatcher._harvest.
            if r is None or not done[s] or self._slot_req[s] != r:
                continue
            out[r] = (view["tokens"][s], view["scores"][s])
            self._slot_req[s] = None
        return out
