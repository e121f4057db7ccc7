"""Autoregressive sampling for the decoder LM.

The reference has no inference path at all (SURVEY.md: training-only).
This provides greedy / temperature / top-k sampling under one jit:
a ``lax.scan`` over decode steps with a statically-shaped token buffer.

Each step re-runs the full forward on the (padded) buffer — correct for
every architecture flag (NSA's global top-k selection may spend slots on
not-yet-generated positions, but its index-based causal mask guarantees no
future leakage, matching reference semantics sparse_attention.py:469-472).
An incremental KV-cache decode path is a planned optimization; this one is
O(n) forwards and works unchanged for MoE/NSA/mHC combinations.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from forde_tpu.models.decoder_lm import FORDEDecoderLM


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "temperature", "top_k"),
)
def generate(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jnp.ndarray:
    """Sample ``max_new_tokens`` continuations of ``prompt_ids`` (B, P).

    ``temperature == 0`` -> greedy argmax. ``top_k`` restricts sampling to
    the k most likely tokens. Returns (B, P + max_new_tokens).
    """
    b, p = prompt_ids.shape
    total = p + max_new_tokens
    ids = jnp.zeros((b, total), jnp.int32).at[:, :p].set(prompt_ids)

    def step(carry, _):
        ids, cur, key = carry
        (logits, _), _ = model.apply(variables, ids, mutable=["stats_buffer"])
        next_logits = jnp.take_along_axis(
            logits, (cur - 1)[None, None, None].repeat(b, 0), axis=1
        )[:, 0, :].astype(jnp.float32)  # (B, V)

        key, sample_key = jax.random.split(key)
        if temperature == 0:
            next_token = jnp.argmax(next_logits, axis=-1)
        else:
            scaled = next_logits / temperature
            if top_k is not None:
                kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
                scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            next_token = jax.random.categorical(sample_key, scaled, axis=-1)

        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, next_token)
        return (ids, cur + 1, key), next_token

    (ids, _, _), _ = jax.lax.scan(
        step, (ids, jnp.array(p, jnp.int32), key), None, length=max_new_tokens
    )
    return ids


def _sample(next_logits, sample_key, temperature, top_k):
    if temperature == 0:
        return jnp.argmax(next_logits, axis=-1)
    scaled = next_logits / temperature
    if top_k is not None:
        kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    return jax.random.categorical(sample_key, scaled, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("model", "max_new_tokens", "temperature", "top_k"),
)
def generate_cached(
    model: FORDEDecoderLM,
    variables,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
) -> jnp.ndarray:
    """KV-cache incremental sampling: O(1) attention work per new token.

    Requires ``scan_layers=False`` (the scan carries no per-layer cache).
    Dense-causal configs prefill the whole prompt in one forward pass;
    NSA configs feed the prompt token-by-token (the NSA caches — window
    ring, pool chunk sums, top-k score/kv buffers — are streaming
    structures; a parallel NSA prefill is future work).

    NSA note: this path implements STREAMING semantics (each position
    computed at its generation-time length), while ``generate``'s
    full-recompute reevaluates earlier positions under the final
    length's gates/top-k selection — NSA's reference semantics are not
    streaming-consistent in depth, so the two can differ once the
    sequence outgrows the local window (exactly below the window they
    coincide; see nn/attention.NativeSparseAttention._decode_step).
    """
    if model.config.use_sparse_attention:
        return _generate_cached_stepwise(
            model, variables, prompt_ids, key, max_new_tokens, temperature,
            top_k,
        )
    b, p = prompt_ids.shape

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
        logits[:, -1, :].astype(jnp.float32), sample_key, temperature, top_k
    )

    ids = jnp.zeros((b, p + max_new_tokens), jnp.int32)
    ids = ids.at[:, :p].set(prompt_ids).at[:, p].set(next_token)

    def step(carry, _):
        ids, cache, cur, token, key = carry
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
            logits[:, 0, :].astype(jnp.float32), sample_key, temperature, top_k
        )
        ids = jax.vmap(lambda row, t: row.at[cur].set(t))(ids, nxt)
        return (ids, cache, cur + 1, nxt, key), None

    (ids, _, _, _, _), _ = jax.lax.scan(
        step,
        (ids, cache, jnp.array(p + 1, jnp.int32), next_token, key),
        None,
        length=max_new_tokens - 1,
    )
    return ids


def _generate_cached_stepwise(
    model, variables, prompt_ids, key, max_new_tokens, temperature, top_k
):
    """Single-token-at-a-time cached decoding (NSA configs): every position
    — prompt and generated alike — runs one cached step; sampled tokens are
    written only past the prompt (teacher forcing inside it)."""
    b, p = prompt_ids.shape
    total = p + max_new_tokens

    cache = model.init(
        jax.random.PRNGKey(0), jnp.zeros((b, 1), jnp.int32), None, True, True
    )["cache"]
    model_vars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    ids = jnp.zeros((b, total), jnp.int32).at[:, :p].set(prompt_ids)

    def step(carry, t):
        ids, cache, key = carry
        token = jax.lax.dynamic_slice(ids, (0, t), (b, 1))
        (logits, _), updated = model.apply(
            {**model_vars, "cache": cache},
            token,
            None,
            True,
            True,
            mutable=["cache", "stats_buffer"],
        )
        key, sample_key = jax.random.split(key)
        nxt = _sample(
            logits[:, 0, :].astype(jnp.float32), sample_key, temperature, top_k
        )
        # keep the prompt token at t+1 while still inside the prompt
        existing = jax.lax.dynamic_slice(ids, (0, t + 1), (b, 1))[:, 0]
        write = jnp.where(t + 1 < p, existing, nxt)
        ids = jax.lax.dynamic_update_slice(ids, write[:, None], (0, t + 1))
        return (ids, updated["cache"], key), None

    (ids, _, _), _ = jax.lax.scan(
        step, (ids, cache, key), jnp.arange(total - 1)
    )
    return ids
