"""Speculative decoding: a small draft model proposes, the target verifies.

A latency capability far beyond the training-only reference (SURVEY.md §0).
Standard speculative sampling (Leviathan et al. / Chen et al.): per round
the draft model autoregressively proposes ``gamma`` tokens; the target
model scores all of them in ONE chunked KV-cache forward; each proposal
``d_i`` is accepted with probability ``min(1, p_i(d_i) / q_i(d_i))``, and
on the first rejection a replacement is drawn from ``norm(max(p - q, 0))``
— so the OUTPUT DISTRIBUTION IS EXACTLY THE TARGET MODEL'S (token-exact
vs ``generate_cached`` for greedy; tests/test_speculative.py), while the
target runs ~(accepted+1) tokens per forward instead of one.

TPU-first details:
  * everything (draft scan, chunk verification, acceptance, cache
    rollback) is one jitted program — a ``lax.while_loop`` over rounds
    with static shapes; no host round-trips per token;
  * rejection rollback is O(1): the dense decode caches mask strictly by
    ``cache_index``/``pos_index`` (nn/attention.CausalSelfAttention), so
    rewinding is just resetting those counters — stale K/V rows are
    masked now and overwritten later.

Scope: dense-causal configs only (``use_sparse_attention=False`` for both
models). NSA's streaming caches (ring buffer + running top-k set) are
destructive on insert and cannot be rewound; drafting for NSA targets
would need cache snapshots — a measured follow-up, not attempted here.
Batch 1 (the latency regime speculative decoding exists for): per-row
acceptance counts diverge, and the cache index is per-layer, not per-row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import _filter_logits


def _dist(logits, temperature, top_k, top_p):
    """(..., V) fp32 logits -> the sampling distribution the generator
    draws from (one-hot argmax when temperature == 0)."""
    if temperature == 0:
        return jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), logits.shape[-1], dtype=jnp.float32
        )
    return jax.nn.softmax(
        _filter_logits(logits / temperature, top_k, top_p), axis=-1
    )


def _rollback(cache, new_index):
    """Rewind a dense decode cache to ``new_index`` tokens: every
    ``cache_index``/``pos_index`` leaf (scalar, or (L,) under scan_layers)
    is set; K/V contents stay — rows past the index are masked."""

    def fix(path, leaf):
        name = str(getattr(path[-1], "key", getattr(path[-1], "name", "")))
        if name in ("cache_index", "pos_index"):
            return jnp.full_like(leaf, new_index)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "draft_model", "max_new_tokens", "gamma", "temperature",
        "top_k", "top_p", "eos_id", "pad_id", "with_stats",
    ),
)
def generate_speculative(
    model: FORDEDecoderLM,
    variables,
    draft_model: FORDEDecoderLM,
    draft_variables,
    prompt_ids: jnp.ndarray,
    key: jax.Array,
    max_new_tokens: int = 32,
    gamma: int = 4,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    pad_id: int = 0,
    with_stats: bool = False,
):
    """Sample ``max_new_tokens`` continuations of ``prompt_ids`` (1, P)
    from the TARGET model's distribution, accelerated by the draft.

    Returns (1, P + max_new_tokens) ids, or ``(ids, stats)`` with
    ``with_stats=True`` where stats = {"rounds", "generated"} (mean
    accepted per round = generated/rounds − 1).
    """
    cfg, dcfg = model.config, draft_model.config
    assert not cfg.use_sparse_attention and not dcfg.use_sparse_attention, (
        "speculative decoding requires dense-causal configs (NSA's "
        "streaming caches cannot be rewound)"
    )
    assert cfg.vocab_size == dcfg.vocab_size
    assert gamma >= 1
    b, p = prompt_ids.shape
    assert b == 1, "speculative decoding is the batch-1 latency path"
    need = p + max_new_tokens + gamma + 1
    assert need <= min(cfg.max_seq_len, dcfg.max_seq_len), (
        f"prompt + max_new_tokens + gamma overruns max_seq_len ({need})"
    )

    tvars = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    dvars = {
        "params": draft_variables["params"],
        "stats_buffer": draft_variables.get("stats_buffer", {}),
    }

    def init_cache(m):
        return m.init(
            jax.random.PRNGKey(0), prompt_ids, None, True, True
        )["cache"]

    def feed(m, mvars, cache, tokens):
        (logits, _), upd = m.apply(
            {**mvars, "cache": cache}, tokens, None, True, True,
            mutable=["cache", "stats_buffer"],
        )
        return logits, upd["cache"]

    t_cache, d_cache = init_cache(model), init_cache(draft_model)
    # Prefill all but the LAST prompt token; the caches always hold the
    # accepted sequence minus one "pending" token (the round feeds it).
    if p > 1:
        _, t_cache = feed(model, tvars, t_cache, prompt_ids[:, :-1])
        _, d_cache = feed(draft_model, dvars, d_cache, prompt_ids[:, :-1])
    pending = prompt_ids[:, -1]  # (B,)

    buflen = p + max_new_tokens + gamma + 1
    ids = jnp.zeros((b, buflen), jnp.int32).at[:, :p].set(prompt_ids)

    def cond(carry):
        _, n, *_rest, done, _rounds = carry
        return (n < max_new_tokens) & ~done

    def body(carry):
        ids, n, pending, t_cache, d_cache, key, done, rounds = carry
        key, k_draft, k_acc, k_res = jax.random.split(key, 4)

        # --- draft phase: feed [pending, d_1..d_gamma], sampling each ---
        def draft_step(carry, k_i):
            dc, tok = carry
            logits, dc = feed(draft_model, dvars, dc, tok[:, None])
            q = _dist(
                logits[:, -1].astype(jnp.float32), temperature, top_k, top_p
            )  # (B, V)
            nxt = jax.random.categorical(k_i, jnp.log(q), axis=-1)
            return (dc, nxt), (nxt, q)

        (d_cache, d_last), (d_toks, q_probs) = jax.lax.scan(
            draft_step, (d_cache, pending), jax.random.split(k_draft, gamma)
        )  # d_toks (gamma, B); q_probs (gamma, B, V)
        # keep the draft cache aligned with the target's: ingest d_gamma
        _, d_cache = feed(draft_model, dvars, d_cache, d_last[:, None])

        # --- target phase: ONE chunked forward over [pending, d_1..d_g] ---
        chunk = jnp.concatenate(
            [pending[:, None], d_toks.T], axis=1
        )  # (B, gamma+1)
        logits, t_cache = feed(model, tvars, t_cache, chunk)
        p_probs = _dist(
            logits.astype(jnp.float32), temperature, top_k, top_p
        )  # (B, gamma+1, V): [:, i-1] is the target dist for d_i;
        #    [:, gamma] is the bonus dist after all gamma accepted

        # --- acceptance: u_i < p_i(d_i) / q_i(d_i), stop at first reject --
        d_flat = d_toks[:, 0]  # (gamma,) batch 1
        p_at = p_probs[0, jnp.arange(gamma), d_flat]
        q_at = jnp.maximum(q_probs[:, 0, :][jnp.arange(gamma), d_flat], 1e-30)
        u = jax.random.uniform(k_acc, (gamma,))
        accept = u < p_at / q_at
        k_accepted = jnp.argmin(
            jnp.concatenate([accept, jnp.zeros((1,), bool)])
        )  # first False; == gamma when all accepted

        # --- replacement / bonus: one unified residual draw ---
        # all-accepted: q row is zeros -> residual IS the bonus dist
        all_p = p_probs[0]  # (gamma+1, V)
        all_q = jnp.concatenate(
            [q_probs[:, 0, :], jnp.zeros_like(p_probs[0, gamma:])], axis=0
        )
        p_r, q_r = all_p[k_accepted], all_q[k_accepted]
        resid = jnp.maximum(p_r - q_r, 0.0)
        norm = resid.sum()
        resid = jnp.where(norm > 0, resid / jnp.maximum(norm, 1e-30), p_r)
        t_new = jax.random.categorical(k_res, jnp.log(resid))  # scalar

        # --- emit k_accepted draft tokens + the replacement/bonus ---
        emit = jnp.concatenate([d_flat, jnp.zeros((1,), jnp.int32)])
        emit = emit.at[k_accepted].set(t_new.astype(jnp.int32))
        ids = jax.lax.dynamic_update_slice(ids, emit[None], (0, p + n))
        jpos = jnp.arange(gamma + 1)
        if eos_id is not None:
            done = done | jnp.any((jpos <= k_accepted) & (emit == eos_id))

        # --- rollback both caches to the accepted length ---
        new_len = p - 1 + n + k_accepted + 1  # tokens held (minus pending)
        t_cache = _rollback(t_cache, new_len)
        d_cache = _rollback(d_cache, new_len)
        return (
            ids, n + k_accepted + 1, emit[k_accepted][None], t_cache,
            d_cache, key, done, rounds + 1,
        )

    ids, n, _, _, _, _, _, rounds = jax.lax.while_loop(
        cond,
        body,
        (
            ids, jnp.array(0, jnp.int32), pending, t_cache, d_cache, key,
            jnp.zeros((), bool), jnp.array(0, jnp.int32),
        ),
    )

    if eos_id is not None:
        pos = jnp.arange(buflen)
        is_eos = (ids == eos_id) & (pos[None] >= p)
        first = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, -1), buflen)
        ids = jnp.where(pos[None] > first[:, None], pad_id, ids)
    else:
        # overshoot tokens past max_new_tokens are sliced; nothing to pad
        pass
    out = ids[:, : p + max_new_tokens]
    if with_stats:
        # the last round may overshoot max_new_tokens; report only the
        # tokens that survive the slice so tokens/forward is honest
        return out, {
            "rounds": rounds,
            "generated": jnp.minimum(n, max_new_tokens),
        }
    return out
