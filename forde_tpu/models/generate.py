"""Autoregressive sampling for the decoder LM.

The reference has no inference path at all (SURVEY.md: training-only).
Two samplers, both greedy / temperature / top-k under one jit:

* ``generate`` — full recompute each step over the (padded) buffer.
  Correct for every architecture flag; NSA's global top-k selection may
  spend slots on not-yet-generated positions, but its index-based causal
  mask guarantees no future leakage (sparse_attention.py:469-472).
* ``generate_cached`` — the production path: parallel prefill + O(1)
  incremental attention per new token for every config including NSA
  (streaming branch caches; see nn/attention.NativeSparseAttention).
  ``nsa_prefill`` builds the NSA caches from one teacher-forced forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.core
import jax
import jax.numpy as jnp

from forde_tpu.models.decoder_lm import FORDEDecoderLM


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "temperature", "top_k", "top_p", "eos_id",
        "pad_id",
    ),
)
def generate(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    pad_id: int = 0,
) -> jnp.ndarray:
    """Sample ``max_new_tokens`` continuations of ``prompt_ids`` (B, P).

    ``temperature == 0`` -> greedy argmax. ``top_k`` restricts sampling to
    the k most likely tokens; ``top_p`` to the nucleus (smallest set with
    cumulative probability >= top_p; composable with top_k). ``eos_id``:
    rows that emit it are finished — every later position is ``pad_id``.
    Returns (B, P + max_new_tokens).
    """
    b, p = prompt_ids.shape
    total = p + max_new_tokens
    ids = jnp.zeros((b, total), jnp.int32).at[:, :p].set(prompt_ids)

    def step(carry, _):
        ids, cur, key, done = carry
        (logits, _), _ = model.apply(variables, ids, mutable=["stats_buffer"])
        next_logits = jnp.take_along_axis(
            logits, (cur - 1)[None, None, None].repeat(b, 0), axis=1
        )[:, 0, :].astype(jnp.float32)  # (B, V)

        key, sample_key = jax.random.split(key)
        next_token = _sample(next_logits, sample_key, temperature, top_k, top_p)

        next_token = jnp.where(done, pad_id, next_token)
        if eos_id is not None:
            done = done | (next_token == eos_id)
        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, next_token)
        return (ids, cur + 1, key, done), next_token

    (ids, _, _, _), _ = jax.lax.scan(
        step,
        (ids, jnp.array(p, jnp.int32), key, jnp.zeros((b,), bool)),
        None,
        length=max_new_tokens,
    )
    return ids


def _filter_logits(scaled, top_k, top_p):
    """Apply top-k then nucleus (top-p) filtering to (..., V) logits."""
    assert top_p is None or 0.0 < top_p <= 1.0, (
        f"top_p must be in (0, 1], got {top_p} (0 would mask every token)"
    )
    if top_k is not None:
        kth = jax.lax.top_k(scaled, top_k)[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    if top_p is not None:
        # Nucleus sampling: keep the smallest prefix of the
        # descending-probability ordering whose mass reaches top_p (the
        # crossing token included). One vocab sort per step — cheap next
        # to the decode forward.
        sorted_desc = -jnp.sort(-scaled, axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p  # mass BEFORE this token still < p
        threshold = jnp.min(
            jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
        )
        scaled = jnp.where(scaled < threshold, -jnp.inf, scaled)
    return scaled


def _sample(next_logits, sample_key, temperature, top_k, top_p=None):
    if temperature == 0:
        return jnp.argmax(next_logits, axis=-1)
    return jax.random.categorical(
        sample_key, _filter_logits(next_logits / temperature, top_k, top_p),
        axis=-1,
    )


def sample_rows(next_logits, sample_key, temps, top_ks=None, top_ps=None):
    """Per-ROW sampling with TRACED parameters — the continuous-pool
    sampler. ``temps`` (B,) float (0 = greedy), ``top_ks`` (B,) int32
    (0 = off), ``top_ps`` (B,) float (1.0 = off). Because every
    parameter is a traced tensor, requests with different sampling
    settings share one compiled step program (no per-request recompiles).

    Matches ``_sample``/``_filter_logits`` exactly for uniform rows: the
    top-k threshold is the k-th largest (ties kept, like the static
    path), and top-p renormalizes over the top-k-masked logits. One
    descending sort per call — the price the static top-p path already
    pays.
    """
    greedy = jnp.argmax(next_logits, axis=-1)
    scaled = next_logits / jnp.maximum(temps, 1e-6)[:, None]
    if top_ks is not None or top_ps is not None:
        v = scaled.shape[-1]
        sorted_desc = -jnp.sort(-scaled, axis=-1)
        if top_ks is not None:
            kidx = jnp.clip(top_ks - 1, 0, v - 1)
            kth = jnp.take_along_axis(sorted_desc, kidx[:, None], axis=-1)
            kth = jnp.where(top_ks[:, None] > 0, kth, -jnp.inf)
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            # masking only truncates the tail, so the descending order
            # is preserved — no second sort
            sorted_desc = jnp.where(sorted_desc < kth, -jnp.inf, sorted_desc)
        if top_ps is not None:
            probs = jax.nn.softmax(sorted_desc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = cum - probs < top_ps[:, None]
            threshold = jnp.min(
                jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
            )
            scaled = jnp.where(scaled < threshold, -jnp.inf, scaled)
    sampled = jax.random.categorical(sample_key, scaled, axis=-1)
    return jnp.where(temps == 0.0, greedy, sampled)


@functools.partial(jax.jit, static_argnames=("model",))
def prefill_prefix(model: FORDEDecoderLM, variables, prefix_ids: jnp.ndarray):
    """Build a REUSABLE KV cache for a shared prompt prefix (1, L).

    Serving workloads repeat a system prompt across requests; its
    attention K/V depend only on the prefix itself (causal masking), so
    one forward pass amortizes over every request that shares it. The
    returned cache (batch 1, position counters = L) plugs into
    ``generate_cached`` / ``generate_ragged`` via ``prefix_cache`` (tiled
    across the request batch there) and into ``DecodePool.register_prefix``.

    Dense-causal configs only (same contract as ``generate_ragged``):
    NSA's compressed-pool chunking and global top-k selection make its
    streaming caches depend on what FOLLOWS the prefix, so a reusable
    prefix fragment does not exist for NSA. Exactness: continuing from
    this cache is bit-identical to prefilling the concatenated prompt —
    suffix queries see the same K/V rows under the same causal masks
    (tests/test_prefix.py).
    """
    if model.config.use_sparse_attention:
        raise ValueError(
            "prefix caching supports dense-causal configs only (NSA "
            "streaming caches depend on what follows the prefix)"
        )
    b, _ = prefix_ids.shape
    assert b == 1, f"prefix is per-server, not per-request; got batch {b}"
    cache = model.init(
        jax.random.PRNGKey(0), prefix_ids, None, True, True
    )["cache"]
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    _, updated = model.apply(
        {**model_vars, "cache": cache}, prefix_ids, None, True, True,
        mutable=["cache", "stats_buffer"],
    )
    return updated["cache"]


def tile_prefix_cache(prefix_cache, b: int):
    """Tile a batch-1 prefix cache across ``b`` request rows (position
    counters — scalar / (L,) leaves — are shared and stay untouched)."""
    return _map_cache_batch(
        prefix_cache, lambda x, ax: jnp.repeat(x, b, axis=ax)
    )


def prefix_length(prefix_cache) -> jnp.ndarray:
    """Token length of a prefix cache (the model-level position counter)."""
    return prefix_cache["pos_index"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "temperature", "top_k", "top_p", "eos_id",
        "pad_id",
    ),
)
def generate_cached(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    pad_id: int = 0,
    prefix_cache=None,
) -> jnp.ndarray:
    """KV-cache incremental sampling: O(1) attention work per new token.

    Works with BOTH layer layouts — unrolled and ``scan_layers=True`` (the
    cache collection carries a leading (L,) axis through nn.scan, so
    serving compiles one block instead of num_layers copies).
    Both config families prefill the whole prompt in ONE forward pass:
    dense-causal through the decode path itself, NSA through
    ``nsa_prefill`` (the streaming caches are built directly from the
    captured per-layer activations of a teacher-forced forward).

    ``prefix_cache`` (optional, dense configs): a shared-prefix cache
    from ``prefill_prefix`` — the prompt is treated as the SUFFIX and
    prefilled at the prefix's position offset; the returned buffer holds
    suffix + continuation only (the caller owns the prefix). Token-exact
    vs prefilling the concatenated prompt.

    NSA note: generation implements STREAMING semantics (each new
    position computed at its generation-time length), while ``generate``'s
    full-recompute reevaluates earlier positions under the final
    length's gates/top-k selection — NSA's reference semantics are not
    streaming-consistent in depth, so the two can differ once the
    sequence outgrows the local window (exactly below the window they
    coincide; see nn/attention.NativeSparseAttention._decode_step).
    """
    if model.config.use_sparse_attention:
        if prefix_cache is not None:
            raise ValueError(
                "prefix caching supports dense-causal configs only"
            )
        return _generate_cached_nsa(
            model, variables, prompt_ids, key, max_new_tokens, temperature,
            top_k, top_p, eos_id, pad_id,
        )
    b, p = prompt_ids.shape

    if prefix_cache is not None:
        # continue from the shared prefix, tiled across the request batch
        cache = tile_prefix_cache(prefix_cache, b)
    else:
        # Materialize cache shapes (init-time creation; values unused).
        cache = model.init(
            jax.random.PRNGKey(0), prompt_ids, None, True, True
        )["cache"]
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }

    # Prefill: one full forward over the prompt populates the cache.
    (logits, _), updated = model.apply(
        {**model_vars, "cache": cache},
        prompt_ids,
        None,
        True,
        True,
        mutable=["cache", "stats_buffer"],
    )
    cache = updated["cache"]
    key, sample_key = jax.random.split(key)
    next_token = _sample(
        logits[:, -1, :].astype(jnp.float32), sample_key, temperature, top_k,
        top_p,
    )
    done = jnp.zeros((b,), bool)
    if eos_id is not None:
        done = next_token == eos_id

    ids = jnp.zeros((b, p + max_new_tokens), jnp.int32)
    ids = ids.at[:, :p].set(prompt_ids).at[:, p].set(next_token)

    def step(carry, _):
        ids, cache, cur, token, key, done = carry
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache},
            token[:, None],
            None,
            True,
            True,
            mutable=["cache", "stats_buffer"],
        )
        cache = updated["cache"]
        key, sample_key = jax.random.split(key)
        nxt = _sample(
            logits[:, 0, :].astype(jnp.float32), sample_key, temperature,
            top_k, top_p,
        )
        nxt = jnp.where(done, pad_id, nxt)
        if eos_id is not None:
            done = done | (nxt == eos_id)
        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, nxt)
        return (ids, cache, cur + 1, nxt, key, done), None

    (ids, _, _, _, _, _), _ = jax.lax.scan(
        step,
        (ids, cache, jnp.array(p + 1, jnp.int32), next_token, key, done),
        None,
        length=max_new_tokens - 1,
    )
    return ids


def _generate_cached_nsa(
    model, variables, prompt_ids, key, max_new_tokens, temperature, top_k,
    top_p=None, eos_id=None, pad_id=0,
):
    """NSA cached decoding: parallel teacher-forced prefill (one forward,
    nsa_prefill) then streaming single-token steps for new tokens."""
    b, p = prompt_ids.shape
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    cache, last_logits = nsa_prefill(model, variables, prompt_ids)
    key, sample_key = jax.random.split(key)
    next_token = _sample(
        last_logits.astype(jnp.float32), sample_key, temperature, top_k, top_p
    )
    done = jnp.zeros((b,), bool)
    if eos_id is not None:
        done = next_token == eos_id
    ids = jnp.zeros((b, p + max_new_tokens), jnp.int32)
    ids = ids.at[:, :p].set(prompt_ids).at[:, p].set(next_token)

    def step(carry, _):
        ids, cache, cur, token, key, done = carry
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache},
            token[:, None],
            None,
            True,
            True,
            mutable=["cache", "stats_buffer"],
        )
        key, sample_key = jax.random.split(key)
        nxt = _sample(
            logits[:, 0, :].astype(jnp.float32), sample_key, temperature,
            top_k, top_p,
        )
        nxt = jnp.where(done, pad_id, nxt)
        if eos_id is not None:
            done = done | (nxt == eos_id)
        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, nxt)
        return (ids, updated["cache"], cur + 1, nxt, key, done), None

    (ids, _, _, _, _, _), _ = jax.lax.scan(
        step,
        (ids, cache, jnp.array(p + 1, jnp.int32), next_token, key, done),
        None,
        length=max_new_tokens - 1,
    )
    return ids


def nsa_prefill(model, variables, prompt_ids, lengths=None):
    """Parallel (teacher-forced) prefill for NSA configs: ONE full forward
    over the prompt, then the streaming caches are constructed directly
    from the captured per-layer attention inputs — the cache contents are
    all linear per-token/per-chunk functions of them (local k/v = slices
    of qkv_proj(x); pool k/v = proj of chunk means; top-k rows =
    scorer/proj of x). Returns (cache, last_position_logits).

    Teacher-forced prefill is the RIGHT semantics for a given prompt (the
    exact forward at its length); generation then continues with the
    streaming decode step. Costs one O(P) forward instead of P
    single-token steps.

    Works for BOTH layer layouts: unrolled (per-layer ``layer_{i}`` cache
    subtrees, built in a Python loop) and ``scan_layers=True`` (leaves
    carry a leading (L,) axis; the same per-layer builder is vmapped over
    it).

    ``lengths`` (B,): the RAGGED path — ``prompt_ids`` is RIGHT-padded
    and row i's true length is ``lengths[i]``. The forward runs with the
    model's length-aware NSA masking (per-row traced gates, -inf pad
    importance, per-row pool counts — nn/attention.NativeSparseAttention
    ``lengths``), so every position < lengths[i] computes exactly what a
    per-row exact-length forward would; the caches are then built
    per-row (gathered ring slots, masked chunk writes, -inf-masked top-k
    insertions) and are LEAF-EXACT against the exact-length prefill of
    each row (tests/test_nsa_ragged.py). Returned logits are each row's
    LAST-real-token logits. Any mix of lengths at one padded bucket
    shares a single compiled program — the serving property the pow2
    prefill buckets of DecodePool need. Per-layer/scalar position
    counters cannot represent mixed lengths (batch 1 gets the true
    length; otherwise 0) — ragged caches must be decoded with per-row
    ``positions``, which the pool and ``generate_ragged`` always pass.
    """
    cfg = model.config
    b, p = prompt_ids.shape
    dt = cfg.dtypes.compute

    (logits, _), state = model.apply(
        variables,
        prompt_ids,
        lengths=lengths,
        mutable=["stats_buffer", "intermediates"],
        capture_intermediates=lambda mdl, name: mdl.name == "attn_norm",
    )
    inter = state["intermediates"]

    cache = flax.core.unfreeze(
        model.init(
            jax.random.PRNGKey(0), jnp.zeros((b, 1), jnp.int32), None, True,
            True,
        )["cache"]
    )
    params = variables["params"]

    def dense(x, prm):
        y = x.astype(dt) @ prm["kernel"].astype(dt)
        if "bias" in prm:
            y = y + prm["bias"].astype(dt)
        return y

    def split_heads(x):
        bb, ss, _ = x.shape
        return x.reshape(bb, ss, cfg.num_heads, cfg.head_dim).transpose(
            0, 2, 1, 3
        )

    # scalar position counters cannot represent mixed row lengths; see
    # docstring (per-row ``positions`` must drive ragged-cache decode)
    counter_len = p if lengths is None else None

    def build_layer(x, lp, lc):
        """(B, P, d_model) attn_norm output + layer params + empty layer
        cache -> filled layer cache (pure; vmapped for scan layouts)."""
        lc = jax.tree.map(lambda a: a, lc)  # fresh containers
        if counter_len is not None:
            lc["nsa_pos"] = jnp.asarray(counter_len, jnp.int32)
        else:
            lc["nsa_pos"] = (
                lengths[0] if b == 1 else jnp.asarray(0, jnp.int32)
            ).astype(jnp.int32)

        # local branch: ring buffer of the last w k/v rows (slot = pos % w)
        la = lc["local_attention"]
        w = la["cached_key"].shape[2]
        qkv = dense(x, lp["local_attention"]["qkv_proj"])
        _, k, v = jnp.split(qkv, 3, axis=-1)
        kh, vh = split_heads(k), split_heads(v)  # (B, H, P, d)
        if lengths is None:
            t = min(p, w)
            slots = jnp.mod(jnp.arange(p - t, p), w)
            la["cached_key"] = la["cached_key"].at[:, :, slots].set(
                kh[:, :, p - t:].astype(la["cached_key"].dtype)
            )
            la["cached_value"] = la["cached_value"].at[:, :, slots].set(
                vh[:, :, p - t:].astype(la["cached_value"].dtype)
            )
        else:
            # per-row gather: ring slot j holds the LAST position < len
            # congruent to j mod w — src_j = (len-1) - ((len-1-j) mod w);
            # slots a short row never wrote (src < 0) stay zero, exactly
            # as the exact-length prefill leaves them (they are masked by
            # the decode read's slot_pos >= 0 reconstruction anyway).
            j = jnp.arange(w)
            src = (lengths[:, None] - 1) - jnp.mod(
                lengths[:, None] - 1 - j[None, :], w
            )  # (B, w)
            valid = (src >= 0)[:, None, :, None]
            idx = jnp.clip(src, 0, p - 1)[:, None, :, None]
            gk = jnp.take_along_axis(kh, idx, axis=2)  # (B, H, w, d)
            gv = jnp.take_along_axis(vh, idx, axis=2)
            la["cached_key"] = jnp.where(valid, gk, 0).astype(
                la["cached_key"].dtype
            )
            la["cached_value"] = jnp.where(valid, gv, 0).astype(
                la["cached_value"].dtype
            )
        if counter_len is not None:
            la["cache_index"] = jnp.asarray(counter_len, jnp.int32)
        else:
            la["cache_index"] = (
                lengths[0] if b == 1 else jnp.asarray(0, jnp.int32)
            ).astype(jnp.int32)

        ratio = cfg.compression_ratio
        if "comp_k" in lc:
            n_complete = p // ratio  # chunk CAPACITY of the padded buffer
            if n_complete:
                means = x[:, : n_complete * ratio].reshape(
                    b, n_complete, ratio, -1
                ).mean(axis=2)
                ck = split_heads(dense(means, lp["compressed_k_proj"]))
                cv = split_heads(dense(means, lp["compressed_v_proj"]))
                if lengths is not None:
                    # only chunks fully inside a row's true length exist;
                    # the rest stay zero (exact-length prefill parity)
                    cmask = (
                        jnp.arange(n_complete)[None, :]
                        < (lengths // ratio)[:, None]
                    )[:, None, :, None]
                    ck = jnp.where(cmask, ck, 0)
                    cv = jnp.where(cmask, cv, 0)
                lc["comp_k"] = lc["comp_k"].at[:, :, :n_complete].set(
                    ck.astype(lc["comp_k"].dtype)
                )
                lc["comp_v"] = lc["comp_v"].at[:, :, :n_complete].set(
                    cv.astype(lc["comp_v"].dtype)
                )
            if lengths is None:
                tail = x[:, n_complete * ratio : p]
                lc["comp_chunk_sum"] = jnp.sum(tail, axis=1, dtype=jnp.float32)
            else:
                # running sum of each row's OWN incomplete tail chunk
                tpos = jnp.arange(p)[None, :]
                tmask = (tpos >= (lengths // ratio * ratio)[:, None]) & (
                    tpos < lengths[:, None]
                )
                lc["comp_chunk_sum"] = jnp.sum(
                    jnp.where(tmask[:, :, None], x, 0),
                    axis=1,
                    dtype=jnp.float32,
                )

        if "topk_scores" in lc:
            # Running top-k set (O(k) cache): replay the same insertion
            # the streaming decode step performs, once per prompt
            # position, so the prefill cache is leaf-exact against
            # token-by-token streaming (set AND slot order).
            from forde_tpu.nn.attention import topk_insert

            scores = dense(x, lp["importance_scorer"])[..., 0].astype(
                jnp.float32
            )  # (B, P)
            if lengths is not None:
                # pad positions can never enter the kept set: -inf is
                # rejected by the strictly-greater acceptance rule, so
                # the insertion sequence matches each row's exact-length
                # replay step for step
                scores = jnp.where(
                    jnp.arange(p)[None, :] < lengths[:, None], scores,
                    -jnp.inf,
                )
            tk = split_heads(dense(x, lp["topk_k_proj"]))  # (B, H, P, d)
            tv = split_heads(dense(x, lp["topk_v_proj"]))

            def insert(carry, t):
                return (
                    topk_insert(
                        carry, scores[:, t],
                        jax.lax.dynamic_slice_in_dim(tk, t, 1, axis=2),
                        jax.lax.dynamic_slice_in_dim(tv, t, 1, axis=2),
                        t,
                    ),
                    None,
                )

            (sc, ix, kk, vv), _ = jax.lax.scan(
                insert,
                (lc["topk_scores"], lc["topk_idx"],
                 lc["topk_k"], lc["topk_v"]),
                jnp.arange(p),
            )
            lc["topk_scores"], lc["topk_idx"] = sc, ix
            lc["topk_k"], lc["topk_v"] = kk, vv
        return lc

    if lengths is None:
        cache["pos_index"] = jnp.asarray(p, jnp.int32)
    else:
        cache["pos_index"] = (
            lengths[0] if b == 1 else jnp.asarray(0, jnp.int32)
        ).astype(jnp.int32)
    if cfg.scan_layers:
        x_stack = inter["layers"]["block"]["attn_norm"]["__call__"][0]
        cache["layers"]["block"]["sparse_attention"] = jax.vmap(build_layer)(
            x_stack,
            params["layers"]["block"]["sparse_attention"],
            cache["layers"]["block"]["sparse_attention"],
        )
    else:
        for i in range(cfg.num_layers):
            lname = f"layer_{i}"
            cache[lname]["sparse_attention"] = build_layer(
                inter[lname]["attn_norm"]["__call__"][0],  # (B, P, d_model)
                params[lname]["sparse_attention"],
                cache[lname]["sparse_attention"],
            )

    if lengths is None:
        return cache, logits[:, -1, :]
    last = jnp.take_along_axis(
        logits, (lengths - 1)[:, None, None], axis=1
    )[:, 0, :]  # each row's LAST-real-token logits
    return cache, last


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "temperature", "top_k", "top_p", "eos_id",
        "pad_id",
    ),
)
def generate_ragged(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    pad_id: int = 0,
    prefix_cache=None,
) -> jnp.ndarray:
    """Ragged-batch KV-cache sampling: mixed-length prompts, ONE program.

    ``prompt_ids`` is (B, P_max) RIGHT-padded; ``prompt_lens`` (B,) gives
    each row's true length (>= 1). Every row decodes at its own position:
    the prefill runs once over the padded buffer (pad rows' K/V land in
    the cache but per-row causal masks keep them forever invisible — each
    row's generated token t overwrites cache position ``len + t`` before
    any query can see it), per-row last-token logits seed the sampling,
    and each decode step scatters K/V at per-row positions
    (nn/attention.CausalSelfAttention ``positions``) with per-row learned
    position embeddings.

    Compared with grouping prompts by length (one compiled program PER
    distinct length — minutes each through the remote TPU compiler), any
    mix of lengths at a fixed (B, P_max) bucket shares one executable.

    Works for dense-causal AND NSA configs: NSA rows prefill through the
    length-aware ``nsa_prefill`` (each row's streaming caches built at
    its own true length in one padded forward) and decode with per-row
    positions — NSA's branch caches are all per-row, so no shared
    counter is needed. ``prefix_cache`` stays dense-only.
    Row i's result is ``out[i, :prompt_lens[i] + max_new_tokens]``
    (prompt then continuation; positions past EOS are ``pad_id``).
    Returns (B, P_max + max_new_tokens); the slack region between a
    row's end and the buffer end is ``pad_id``.

    ``prefix_cache`` (optional): a shared-prefix cache from
    ``prefill_prefix``, tiled across the batch here — every row's prompt
    is then a SUFFIX prefilled (and decoded) at the prefix's position
    offset. The output buffer still holds suffix + continuation only.
    """
    b, p = prompt_ids.shape
    bidx = jnp.arange(b)
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }

    if model.config.use_sparse_attention:
        # NSA: the ragged (length-aware) teacher-forced prefill builds
        # every row's streaming caches at its OWN length in one padded
        # forward; decode then advances each row at its own position
        # (the per-row NSA decode path). Prefix caching stays
        # dense-only: NSA streaming caches depend on what follows the
        # prefix (see prefill_prefix).
        if prefix_cache is not None:
            raise ValueError(
                "prefix caching supports dense-causal configs only"
            )
        prefix_len = jnp.array(0, jnp.int32)
        cache, last = nsa_prefill(model, model_vars, prompt_ids, prompt_lens)
        last = last.astype(jnp.float32)
    else:
        if prefix_cache is not None:
            prefix_len = prefix_length(prefix_cache)  # traced scalar
            cache = tile_prefix_cache(prefix_cache, b)
        else:
            prefix_len = jnp.array(0, jnp.int32)
            cache = model.init(
                jax.random.PRNGKey(0), prompt_ids, None, True, True
            )["cache"]
        # Prefill over the whole padded buffer (pads included; see above).
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache},
            prompt_ids,
            None,
            True,
            True,
            mutable=["cache", "stats_buffer"],
        )
        cache = updated["cache"]
        last = jnp.take_along_axis(
            logits, (prompt_lens - 1)[:, None, None], axis=1
        )[:, 0, :].astype(jnp.float32)  # (B, V) logits at each row's last token
    key, sample_key = jax.random.split(key)
    next_token = _sample(last, sample_key, temperature, top_k, top_p)
    done = jnp.zeros((b,), bool)
    if eos_id is not None:
        done = next_token == eos_id

    total = p + max_new_tokens
    ids = jnp.zeros((b, total), jnp.int32).at[:, :p].set(prompt_ids)
    # pad the slack between each row's prompt end and the buffer end
    ids = jnp.where(jnp.arange(total)[None, :] < prompt_lens[:, None], ids,
                    pad_id)
    ids = ids.at[bidx, prompt_lens].set(next_token)

    def step(carry, t):
        ids, cache, token, key, done = carry
        local = prompt_lens + t  # the fed token's slot in the OUTPUT row
        # its cache/embedding position includes the shared prefix
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache},
            token[:, None],
            None,
            True,
            True,
            prefix_len + local,
            mutable=["cache", "stats_buffer"],
        )
        key, sample_key = jax.random.split(key)
        nxt = _sample(
            logits[:, 0, :].astype(jnp.float32), sample_key, temperature,
            top_k, top_p,
        )
        nxt = jnp.where(done, pad_id, nxt)
        if eos_id is not None:
            done = done | (nxt == eos_id)
        ids = ids.at[bidx, local + 1].set(nxt)
        return (ids, updated["cache"], nxt, key, done), None

    (ids, _, _, _, _), _ = jax.lax.scan(
        step,
        (ids, cache, next_token, key, done),
        jnp.arange(max_new_tokens - 1),
    )
    return ids


def _map_cache_batch(cache, fn):
    """Apply ``fn(leaf, batch_axis)`` to every batched cache leaf.

    Under ``scan_layers=True`` the per-layer cache lives in a single
    ``layers`` subtree whose leaves carry a leading (L,) axis (nn.scan
    stacks the collection), so batch is axis 1 there; per-layer counters
    are (L,) and stay untouched. Unrolled caches are batch-axis-0 with
    scalar counters.
    """
    out = {}
    for key, sub in flax.core.unfreeze(cache).items():
        stacked = key == "layers"
        min_nd = 2 if stacked else 1
        out[key] = jax.tree.map(
            lambda x: x if x.ndim < min_nd else fn(x, 1 if stacked else 0),
            sub,
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "max_new_tokens", "beam_size", "length_penalty", "eos_id",
        "pad_id",
    ),
)
def generate_beam(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    max_new_tokens: int = 32,
    beam_size: int = 4,
    length_penalty: float = 0.0,
    eos_id: Optional[int] = None,
    pad_id: int = 0,
) -> jnp.ndarray:
    """Beam search over the cached decoder (another capability the
    training-only reference lacks). Standard KV-cache beam search: the
    prompt is prefilled once per beam, then each step expands every beam
    by the vocab, keeps the global top ``beam_size`` continuations, and
    reorders every cache leaf along the beam axis to follow the
    surviving hypotheses. Works with both layer layouts (unrolled and
    ``scan_layers=True``). Returns the best beam, (B, P + max_new_tokens).

    ``eos_id``: beams that emit it are finished — their score freezes
    (later steps can only append ``pad_id`` at logprob 0) and every later
    position is ``pad_id``. ``length_penalty``: final scores are
    sum(logprob) / (generated_length ** penalty), where a finished beam's
    length counts tokens up to and including its EOS (0 = pure sum).
    """
    b, p = prompt_ids.shape
    k = beam_size
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }

    # Prefill each batch row once, then tile the cache across beams.
    if model.config.use_sparse_attention:
        cache, last_logits = nsa_prefill(model, variables, prompt_ids)
    else:
        cache = model.init(
            jax.random.PRNGKey(0), prompt_ids, None, True, True
        )["cache"]
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache}, prompt_ids, None, True, True,
            mutable=["cache", "stats_buffer"],
        )
        cache, last_logits = updated["cache"], logits[:, -1, :]

    cache = _map_cache_batch(
        cache, lambda x, ax: jnp.repeat(x, k, axis=ax)
    )  # (B*k, ...) beam-major per row
    logprobs0 = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
    vocab = logprobs0.shape[-1]
    # first expansion: top-k tokens of each row seed the beams
    top_lp, top_tok = jax.lax.top_k(logprobs0, k)  # (B, k)
    scores = top_lp.reshape(b * k)
    ids = jnp.zeros((b * k, p + max_new_tokens), jnp.int32)
    ids = ids.at[:, :p].set(jnp.repeat(prompt_ids, k, axis=0))
    ids = ids.at[:, p].set(top_tok.reshape(b * k))
    done = jnp.zeros((b * k,), bool)
    gen_len = jnp.ones((b * k,), jnp.int32)
    if eos_id is not None:
        done = ids[:, p] == eos_id
    # finished beams may only extend with pad at logprob 0 (score frozen)
    pad_only = jnp.full((vocab,), -jnp.inf).at[pad_id].set(0.0)

    def step(carry, _):
        ids, cache, scores, cur, token, done, gen_len = carry
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache}, token[:, None], None, True, True,
            mutable=["cache", "stats_buffer"],
        )
        cache = updated["cache"]
        lp = jax.nn.log_softmax(logits[:, 0, :].astype(jnp.float32), axis=-1)
        if eos_id is not None:
            lp = jnp.where(done[:, None], pad_only[None, :], lp)
        # (B, k*V) candidate scores; global top-k per batch row
        cand = (scores[:, None] + lp).reshape(b, k * vocab)
        new_scores, flat_idx = jax.lax.top_k(cand, k)  # (B, k)
        src_beam = flat_idx // vocab  # (B, k) origin beam per survivor
        new_tok = (flat_idx % vocab).reshape(b * k)
        gather_rows = (
            jnp.arange(b)[:, None] * k + src_beam
        ).reshape(b * k)  # rows into the (B*k, ...) beam-major arrays

        ids = ids[gather_rows]
        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, new_tok)
        cache = _map_cache_batch(
            cache, lambda x, ax: jnp.take(x, gather_rows, axis=ax)
        )
        done = done[gather_rows]
        gen_len = gen_len[gather_rows] + jnp.where(done, 0, 1)
        if eos_id is not None:
            done = done | (new_tok == eos_id)
        return (
            ids, cache, new_scores.reshape(b * k), cur + 1, new_tok, done,
            gen_len,
        ), None

    (ids, _, scores, _, _, _, gen_len), _ = jax.lax.scan(
        step,
        (ids, cache, scores, jnp.array(p + 1, jnp.int32),
         top_tok.reshape(b * k), done, gen_len),
        None,
        length=max_new_tokens - 1,
    )
    if length_penalty:
        scores = scores / (gen_len.astype(jnp.float32) ** length_penalty)
    best = jnp.argmax(scores.reshape(b, k), axis=-1)  # (B,)
    return ids.reshape(b, k, -1)[jnp.arange(b), best]
