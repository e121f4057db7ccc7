"""Continuous batching: a fixed-capacity decode pool with token-level
request join/leave (the vLLM-style serving engine, TPU-native).

The reference repo is training-only; batch serving above
(``generate_ragged``) decodes a CLOSED batch — every row waits for the
slowest one, and new requests wait for the whole batch. The pool fixes
both with static shapes XLA can live with:

* a pool of ``rows`` decode slots, each with its own cache rows and
  position counter (reusing the per-row-position machinery of
  ``generate_ragged`` / ``CausalSelfAttention positions``);
* requests PREFILL into a free slot with a single-row program (one
  compile per power-of-two prompt-length bucket) and the resulting
  cache row is scattered into the pool;
* ONE pooled step program advances every active slot one token at its
  own position; inactive slots decode a pad token into scratch space
  (their next insert replaces the whole cache row, so the garbage is
  unobservable);
* a slot frees as soon as its row hits EOS or its own token budget —
  the next queued request takes it on the following scheduler tick.

All shapes are static: the pool size, the bucketed prefill lengths and
the per-step (rows, 1) token tensor never change, so the engine runs
exactly 1 + log2(max_seq_len) compiled programs for its whole life
(plus one k-token fused-step program when ``decode_fuse > 1``).

Serving extras on top:

* **prefix caching** (``register_prefix`` + ``submit(prefix_id=...)``):
  a shared system prompt is prefilled ONCE; each request prefills only
  its suffix at the prefix's position offset (``_prefill_suffix``) and
  the combined cache row is scattered into the slot — token-exact vs
  submitting the concatenated prompt (tests/test_prefix.py);
* **token streaming** (``submit(on_token=...)``): a host callback fires
  for every sampled token the moment the step's tokens land on host —
  the surface serve_http's SSE endpoint rides on.

Serves dense-causal AND NSA configs (the reference's DEFAULT is NSA —
src/forde/model.py:55 ``use_sparse_attention: bool = True``): NSA rows
prefill through the length-aware ``nsa_prefill`` (one compile per pow2
bucket, same as dense) and the pooled step advances every row's
streaming caches (ring window, chunk sums, running top-k) at its own
position via the per-row NSA decode path. NSA limits: no prefix caching
(streaming caches depend on what follows the prefix) and no chunked
prefill (the NSA prefill is one teacher-forced forward; chunk-resumable
NSA caches do not exist).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import nsa_prefill, sample_rows


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_one(model, variables, prompt, length, key, temp, topk, topp):
    """(1, P)-padded prompt -> (cache row stack, first sampled token).

    One compile per pow2-bucketed P (sampling params are TRACED (1,)
    vectors — per-request values share the executable)."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    cache = model.init(jax.random.PRNGKey(0), prompt, None, True, True)[
        "cache"
    ]
    (logits, _), updated = model.apply(
        {**model_vars, "cache": cache}, prompt, None, True, True,
        mutable=["cache", "stats_buffer"],
    )
    last = jnp.take_along_axis(logits, (length - 1)[None, None, None], axis=1)[
        :, 0, :
    ].astype(jnp.float32)
    token = sample_rows(last, key, temp, topk, topp)[0]
    return updated["cache"], token


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_one_nsa(model, variables, prompt, length, key, temp, topk, topp):
    """NSA (1, P)-padded prompt -> (streaming cache row, first token).

    One length-aware teacher-forced forward (``nsa_prefill`` with
    ``lengths``) builds the row's ring/chunk/top-k caches at its TRUE
    length; any mix of lengths at one pow2 bucket shares the executable
    — the same serving property as the dense ``_prefill_one``."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    cache, last = nsa_prefill(model, model_vars, prompt, length[None])
    token = sample_rows(last.astype(jnp.float32), key, temp, topk, topp)[0]
    return cache, token


@functools.partial(jax.jit, static_argnames=("model",))
def _empty_row_cache(model):
    """A fresh single-row cache (counters at 0) for chunked prefill."""
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32), None, True, True
    )["cache"]


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_chunk(
    model, variables, row_cache, chunk, last_local, key, temp, topk, topp
):
    """Advance a single row's prefill by ONE fixed-size chunk.

    The decode-mode apply scatters the chunk's K/V at the row's running
    cache offset and attends back over everything written so far — so a
    prompt split into chunks is the same math as one prefill pass
    (tests/test_prefix.py proves the split-prefill equivalence). Returns
    (cache, token) where the token is sampled at ``last_local`` — only
    meaningful on the FINAL chunk (earlier chunks ignore it), which
    keeps this at one executable for the pool's whole life."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    (logits, _), updated = model.apply(
        {**model_vars, "cache": row_cache}, chunk, None, True, True,
        mutable=["cache", "stats_buffer"],
    )
    last = jnp.take_along_axis(
        logits, last_local[None, None, None], axis=1
    )[:, 0, :].astype(jnp.float32)
    token = sample_rows(last, key, temp, topk, topp)[0]
    return updated["cache"], token


@functools.partial(jax.jit, static_argnames=("model",))
def _prefill_suffix(
    model, variables, prefix_cache, suffix, length, key, temp, topk, topp
):
    """Continue a shared-prefix cache with a (1, S)-padded SUFFIX.

    The prefix forward already ran once (``generate.prefill_prefix``);
    this program only pays for the suffix chunk — the decode-mode apply
    scatters its K/V at the prefix's running offset and attends back
    over prefix + suffix under one causal mask. One compile per pow2
    suffix bucket (the prefix length is a traced cache counter, so every
    prefix shares the executable)."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    (logits, _), updated = model.apply(
        {**model_vars, "cache": prefix_cache}, suffix, None, True, True,
        mutable=["cache", "stats_buffer"],
    )
    last = jnp.take_along_axis(logits, (length - 1)[None, None, None], axis=1)[
        :, 0, :
    ].astype(jnp.float32)
    token = sample_rows(last, key, temp, topk, topp)[0]
    return updated["cache"], token


def _batched_leaf_axis(path) -> Optional[int]:
    """Batch axis of a cache leaf: 1 under the scanned ``layers`` subtree
    (leading (L,) axis), 0 otherwise; None for per-layer counters."""
    keys = [getattr(k, "key", None) for k in path]
    stacked = keys and keys[0] == "layers"
    return 1 if stacked else 0


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_row(pool_cache, row_cache, slot):
    """Scatter a single-row cache into pool slot ``slot`` (traced)."""

    def put(path, pool_leaf, new_leaf):
        ax = _batched_leaf_axis(path)
        if pool_leaf.ndim < ax + 2:
            # scalar / (L,) per-layer counters (pos_index, cache_index):
            # not per-row — the pooled step derives positions per row
            # instead, so their value is irrelevant.
            return pool_leaf
        idx = [slice(None)] * pool_leaf.ndim
        idx[ax] = slot
        taken = jnp.take(new_leaf, 0, axis=ax)
        return pool_leaf.at[tuple(idx)].set(taken)

    return jax.tree_util.tree_map_with_path(put, pool_cache, row_cache)


@functools.partial(
    jax.jit, static_argnames=("model", "k"), donate_argnums=(2,)
)
def _step_pool_k(
    model, variables, cache, tokens, positions, key, temps, topks, topps,
    *, k,
):
    """Advance every pool row k tokens in ONE dispatch (lax.scan).

    The single-token ``_step_pool`` pays the host->device dispatch
    latency (~2 ms through the axon tunnel) every token — comparable to
    the step compute itself at small scales. Scanning k steps inside one
    jit amortizes it k-fold. Per-row positions advance with the scan
    index; a row that hits EOS/budget mid-scan keeps decoding into its
    own cache rows, which is unobservable: the host discards its surplus
    tokens, the slot frees, and the next insert replaces the whole row
    (and an unfinished row overwrites by position before ever attending
    that far). Returns (cache, (k, rows) tokens)."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }

    def body(carry, i):
        cache, toks = carry
        pos = jnp.clip(positions + i, 0, model.config.max_seq_len - 1)
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache}, toks[:, None], None, True,
            True, pos, mutable=["cache", "stats_buffer"],
        )
        nxt = sample_rows(
            logits[:, 0, :].astype(jnp.float32),
            jax.random.fold_in(key, i), temps, topks, topps,
        )
        return (updated["cache"], nxt), nxt

    (cache, _), out = jax.lax.scan(body, (cache, tokens), jnp.arange(k))
    return cache, out


@functools.partial(
    jax.jit, static_argnames=("model",), donate_argnums=(2,)
)
def _step_pool(
    model, variables, cache, tokens, positions, key, temps, topks, topps
):
    """Advance every pool row one token at its own position.

    Sampling params are TRACED per-row vectors (``sample_rows``): mixed
    greedy/sampled/filtered requests share the executable. ``topks`` /
    ``topps`` may be None (the no-filter program skips the vocab sort) —
    the scheduler picks per tick, so at most TWO step programs exist."""
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    safe_pos = jnp.clip(positions, 0, model.config.max_seq_len - 1)
    (logits, _), updated = model.apply(
        {**model_vars, "cache": cache}, tokens[:, None], None, True, True,
        safe_pos, mutable=["cache", "stats_buffer"],
    )
    nxt = sample_rows(
        logits[:, 0, :].astype(jnp.float32), key, temps, topks, topps
    )
    return updated["cache"], nxt


class DecodePool:
    """Host-side scheduler around the three jitted programs.

    Usage:
        pool = DecodePool(model, variables, rows=8, temperature=0.0)
        rid = pool.submit([5, 17, 20], max_new_tokens=16, eos_id=None)
        while pool.pending():
            for rid, output_ids in pool.tick():
                ...  # finished requests, prompt + continuation

    ``tick()`` fills free slots from the queue (one prefill each), runs
    one pooled step, and returns the requests that finished this tick.
    """

    def __init__(
        self,
        model: FORDEDecoderLM,
        variables,
        rows: int = 8,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        seed: int = 0,
        min_prefill_bucket: int = 8,
        prefill_chunk: Optional[int] = None,
        decode_fuse: int = 1,
    ):
        """``prefill_chunk``: process prompt prefills in fixed-size
        chunks, ONE chunk per scheduler tick, instead of one whole-prompt
        program at admission — a long prompt then delays the other rows
        by at most one chunk per tick rather than its full prefill
        latency. Token-exact vs one-shot prefill (chunked decode-mode
        applies are the same math). Prompts whose chunk-aligned span
        would spill past the cache end fall back to one-shot.

        ``decode_fuse``: advance the pool ``decode_fuse`` tokens per
        dispatch via ``_step_pool_k`` instead of one — amortizing the
        per-dispatch host latency, the dominant cost of small-scale
        pools (PERF.md round 4: 173 ticks x ~2 ms ~= 6 s of a 10 s
        makespan). Decode rows are independent, so a later admission
        never changes other rows' outputs: fusing is token-exact vs
        unfused at temperature 0 (for sampled rows the RNG stream
        differs: fold_in per scan index vs split per tick). Costs:
        admission/TTFT gains a bounded k-1 decode steps (a few ms) in
        the worst case, surplus row-steps past a mid-scan EOS are
        discarded, and streaming callbacks fire in order but arrive in
        bursts of up to ``decode_fuse``. While a chunked prefill is in
        flight the scheduler drops to single-token ticks (chunks advance
        one per tick by construction)."""
        self._nsa = bool(model.config.use_sparse_attention)
        if self._nsa and prefill_chunk is not None:
            raise ValueError(
                "chunked prefill requires dense-causal configs — the NSA "
                "prefill is one teacher-forced forward (nsa_prefill); "
                "chunk-resumable NSA caches do not exist"
            )
        self.model = model
        self.variables = variables
        self.rows = rows
        # pool-level DEFAULTS; submit() may override per request
        self.default_sampling = (
            float(temperature),
            0 if top_k is None else int(top_k),
            1.0 if top_p is None else float(top_p),
        )
        # per-slot sampling state (traced into the step program)
        self.temps = np.zeros((rows,), np.float32)
        self.topks = np.zeros((rows,), np.int32)
        self.topps = np.ones((rows,), np.float32)
        self.min_prefill_bucket = min_prefill_bucket
        if prefill_chunk is not None:
            prefill_chunk = max(1, min(prefill_chunk, model.config.max_seq_len))
        self.prefill_chunk = prefill_chunk
        self.decode_fuse = max(1, int(decode_fuse))
        self._filling = [None] * rows  # chunked-prefill state per slot
        self._key = jax.random.PRNGKey(seed)
        self._steps = 0

        # pool cache: init once at (rows, 1) decode shape
        self.cache = model.init(
            jax.random.PRNGKey(0), jnp.zeros((rows, 1), jnp.int32), None,
            True, True,
        )["cache"]
        self.tokens = jnp.zeros((rows,), jnp.int32)  # next token to feed
        self.positions = np.zeros((rows,), np.int64)  # its position
        self.active = np.zeros((rows,), bool)
        self.queue: List[dict] = []
        self._slot_req = [None] * rows  # per-slot request record
        self._next_id = 0
        self._prefixes: List[tuple] = []  # (cache, length) per prefix id
        self.last_step_rows = 0  # rows active in the most recent step

    # ------------------------------------------------------------------

    def register_prefix(self, prefix_ids) -> int:
        """One forward over a shared prompt prefix (system prompt);
        returns a prefix id for ``submit(prefix_id=...)``. Requests using
        it prefill only their suffix — the prefix K/V are copied from
        this cache (compute amortized across every request sharing it)."""
        from forde_tpu.models.generate import prefill_prefix

        prefix_ids = list(map(int, prefix_ids))
        assert prefix_ids, "empty prefix"
        cache = prefill_prefix(
            self.model, self.variables,
            jnp.asarray([prefix_ids], jnp.int32),
        )
        self._prefixes.append((cache, len(prefix_ids)))
        return len(self._prefixes) - 1

    def submit(
        self, prompt_ids, max_new_tokens, eos_id=None, prefix_id=None,
        on_token=None, temperature=None, top_k=None, top_p=None,
    ) -> int:
        """Queue a request; returns its id (reported back by tick()).

        ``prefix_id``: continue from a ``register_prefix`` cache — the
        output still holds prompt + continuation only (the prefix belongs
        to the server). ``on_token``: host callback ``f(request_id,
        token)`` fired for every generated token as it is sampled (the
        streaming surface; serve_http SSE rides on it).
        ``temperature``/``top_k``/``top_p``: PER-REQUEST sampling (None =
        the pool default). Traced per-row into the step program, so mixed
        settings cost zero extra compiles."""
        prompt_ids = list(map(int, prompt_ids))
        assert prompt_ids, "empty prompt"
        plen = self._prefixes[prefix_id][1] if prefix_id is not None else 0
        limit = self.model.config.max_seq_len
        assert plen + len(prompt_ids) + max_new_tokens <= limit, (
            f"prefix {plen} + prompt {len(prompt_ids)} + {max_new_tokens} "
            f"> max_seq_len {limit}"
        )
        d_temp, d_topk, d_topp = self.default_sampling
        rid = self._next_id
        self._next_id += 1
        self.queue.append({
            "id": rid, "prompt": prompt_ids, "max_new": max_new_tokens,
            "eos": eos_id, "prefix": prefix_id, "cb": on_token,
            "temp": d_temp if temperature is None else float(temperature),
            "topk": d_topk if top_k is None else int(top_k),
            "topp": d_topp if top_p is None else float(top_p),
        })
        return rid

    def cancel(self, request_id: int) -> bool:
        """Abandon a request (client went away): drop it from the queue,
        abort its chunked prefill, or free its slot immediately — the
        slot refills on the next tick (its stale cache row is fully
        replaced by the next insert). Returns whether the request was
        found. A cancelled request is never reported by tick(). Call
        from the scheduler thread (the same one driving tick())."""
        for i, req in enumerate(self.queue):
            if req["id"] == request_id:
                del self.queue[i]
                return True
        for slot in range(self.rows):
            st = self._filling[slot]
            if st is not None and st["req"]["id"] == request_id:
                self._filling[slot] = None
                return True
            req = self._slot_req[slot]
            if req is not None and req["id"] == request_id:
                self._finish(slot)
                return True
        return False

    def prefix_len(self, prefix_id: int) -> int:
        return self._prefixes[prefix_id][1]

    def pending(self) -> bool:
        return (
            bool(self.queue)
            or bool(self.active.any())
            or any(st is not None for st in self._filling)
        )

    def active_rows(self) -> int:
        return int(self.active.sum())

    # ------------------------------------------------------------------

    def _fill_slots(self):
        for slot in range(self.rows):
            if (
                self.active[slot]
                or self._filling[slot] is not None
                or not self.queue
            ):
                continue
            req = self.queue.pop(0)
            p = req["prompt"]
            plen0 = (
                self._prefixes[req["prefix"]][1]
                if req["prefix"] is not None else 0
            )
            c = self.prefill_chunk
            if c is not None:
                span = ((len(p) + c - 1) // c) * c  # chunk-aligned
                if plen0 + span <= self.model.config.max_seq_len:
                    # chunked admission: one chunk per tick from here on
                    if req["prefix"] is not None:
                        cache = self._prefixes[req["prefix"]][0]
                    else:
                        cache = _empty_row_cache(self.model)
                    self._filling[slot] = {
                        "req": req, "cache": cache, "done": 0, "plen": plen0,
                    }
                    continue
                # chunk-aligned span would spill past the cache end:
                # fall back to the one-shot (exact-capacity) prefill
            bucket = max(_next_pow2(len(p)), self.min_prefill_bucket)
            # never let the padded chunk spill past the cache end — a
            # dynamic_update_slice at offset plen0 would CLAMP the start
            # index and overwrite prefix rows (submit() guarantees
            # len(p) <= max_seq_len - plen0, so the clamp keeps
            # bucket >= len(p))
            bucket = min(bucket, self.model.config.max_seq_len - plen0)
            padded = np.zeros((1, bucket), np.int32)
            padded[0, : len(p)] = p
            self._key, k = jax.random.split(self._key)
            sampling = (
                jnp.full((1,), req["temp"], jnp.float32),
                jnp.full((1,), req["topk"], jnp.int32),
                jnp.full((1,), req["topp"], jnp.float32),
            )
            if req["prefix"] is not None:
                # unreachable for NSA pools: register_prefix (via
                # prefill_prefix) rejects NSA configs at registration
                prefix_cache, plen = self._prefixes[req["prefix"]]
                row_cache, token = _prefill_suffix(
                    self.model, self.variables, prefix_cache,
                    jnp.asarray(padded), jnp.asarray(len(p), jnp.int32), k,
                    *sampling,
                )
            else:
                plen = 0
                prefill = _prefill_one_nsa if self._nsa else _prefill_one
                row_cache, token = prefill(
                    self.model, self.variables, jnp.asarray(padded),
                    jnp.asarray(len(p), jnp.int32), k, *sampling,
                )
            self._activate_slot(slot, req, row_cache, token, plen)

    def _activate_slot(self, slot, req, row_cache, token, plen):
        """Prefill finished (one-shot or final chunk): scatter the row
        into the pool and start decoding it."""
        p = req["prompt"]
        self.cache = _insert_row(
            self.cache, row_cache, jnp.asarray(slot, jnp.int32)
        )
        self.tokens = self.tokens.at[slot].set(token)
        self.positions[slot] = plen + len(p)
        self.temps[slot] = req["temp"]
        self.topks[slot] = req["topk"]
        self.topps[slot] = req["topp"]
        self.active[slot] = True
        req["out"] = list(p) + [int(token)]
        req["left"] = req["max_new"] - 1
        self._slot_req[slot] = req
        if req["cb"] is not None:
            req["cb"](req["id"], int(token))

    def _advance_fills(self):
        """One prefill chunk per FILLING slot per tick — a long prompt
        delays active rows by at most one chunk's latency per tick."""
        c = self.prefill_chunk
        for slot in range(self.rows):
            st = self._filling[slot]
            if st is None:
                continue
            req = st["req"]
            p = req["prompt"]
            seg = p[st["done"]: st["done"] + c]
            chunk = np.zeros((1, c), np.int32)
            chunk[0, : len(seg)] = seg
            final = st["done"] + c >= len(p)
            last_local = min(len(p) - 1 - st["done"], c - 1)
            self._key, k = jax.random.split(self._key)
            st["cache"], token = _prefill_chunk(
                self.model, self.variables, st["cache"],
                jnp.asarray(chunk), jnp.asarray(last_local, jnp.int32), k,
                jnp.full((1,), req["temp"], jnp.float32),
                jnp.full((1,), req["topk"], jnp.int32),
                jnp.full((1,), req["topp"], jnp.float32),
            )
            st["done"] += c
            if final:
                self._filling[slot] = None
                self._activate_slot(slot, req, st["cache"], token, st["plen"])

    def _finish(self, slot):
        req = self._slot_req[slot]
        self.active[slot] = False
        self._slot_req[slot] = None
        # reset sampling state so a parked slot never forces the
        # filtered step program on everyone else
        self.temps[slot] = 0.0
        self.topks[slot] = 0
        self.topps[slot] = 1.0
        return req["id"], req["out"]

    def tick(self):
        """One scheduler round; returns [(request_id, output_ids), ...]
        finished this round."""
        finished = []
        self._fill_slots()
        if self.prefill_chunk is not None:
            self._advance_fills()
        # rows whose first (prefill-sampled) token already ends them
        for slot in range(self.rows):
            if not self.active[slot]:
                continue
            req = self._slot_req[slot]
            if req["left"] == 0 or req["out"][-1] == req["eos"]:
                finished.append(self._finish(slot))
        if not self.active.any():
            return finished

        self.last_step_rows = int(self.active.sum())
        self._key, k = jax.random.split(self._key)
        # the no-filter program skips the vocab sort; pick it whenever no
        # active row asked for top-k/top-p (two step programs at most)
        filtered = bool(((self.topks > 0) | (self.topps < 1.0)).any())
        # Fuse unless a chunked prefill is in flight (those must advance
        # one chunk per tick). A non-empty queue does NOT block fusing:
        # _fill_slots already admitted into every free slot, so queue
        # non-empty ⇒ all rows busy ⇒ no join is possible this tick
        # anyway — a fused dispatch delays a mid-scan finisher's
        # replacement (and any new arrival) by at most k-1 decode steps,
        # a few ms, vs saving (k-1) × ~2 ms dispatch latency per tick.
        fuse = self.decode_fuse
        if fuse > 1 and any(st is not None for st in self._filling):
            fuse = 1
        if fuse > 1:
            self.cache, toks = _step_pool_k(
                self.model, self.variables, self.cache, self.tokens,
                jnp.asarray(self.positions, jnp.int32), k,
                jnp.asarray(self.temps),
                jnp.asarray(self.topks) if filtered else None,
                jnp.asarray(self.topps) if filtered else None,
                k=fuse,
            )
            self.tokens = toks[-1]
            self._steps += fuse
            toks_host = np.asarray(toks)  # (fuse, rows)
            for slot in range(self.rows):
                if not self.active[slot]:
                    continue
                req = self._slot_req[slot]
                for j in range(fuse):
                    tok = int(toks_host[j, slot])
                    req["out"].append(tok)
                    req["left"] -= 1
                    self.positions[slot] += 1
                    if req["cb"] is not None:
                        req["cb"](req["id"], tok)
                    if req["left"] == 0 or tok == req["eos"]:
                        # surplus scan tokens are discarded; the slot's
                        # cache rows beyond this point hold garbage that
                        # the next insert (or a by-position overwrite)
                        # replaces before anything attends to it
                        finished.append(self._finish(slot))
                        break
            return finished
        self.cache, nxt = _step_pool(
            self.model, self.variables, self.cache, self.tokens,
            jnp.asarray(self.positions, jnp.int32), k,
            jnp.asarray(self.temps),
            jnp.asarray(self.topks) if filtered else None,
            jnp.asarray(self.topps) if filtered else None,
        )
        self.tokens = nxt
        self._steps += 1
        nxt_host = np.asarray(nxt)
        for slot in range(self.rows):
            if not self.active[slot]:
                continue
            req = self._slot_req[slot]
            tok = int(nxt_host[slot])
            req["out"].append(tok)
            req["left"] -= 1
            self.positions[slot] += 1
            if req["cb"] is not None:
                req["cb"](req["id"], tok)
            if req["left"] == 0 or tok == req["eos"]:
                finished.append(self._finish(slot))
        return finished
