"""Reference (pure-jnp) attention primitives.

These are the semantic ground truth for the Pallas kernels in
``flash_attention.py`` — every kernel ships with an equivalence test against
these. The masking semantics reproduce the reference exactly:

  * causal mask: lower-triangular (reference src/forde/sparse_attention.py:22-24)
  * sliding window: ``0 <= q_pos - k_pos < window`` — each position attends
    to ``window`` previous positions including itself
    (src/forde/sparse_attention.py:27-48)
  * masked logits are set to -1e9 before softmax
    (src/forde/sparse_attention.py:88)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def causal_mask(seq_len: int) -> jnp.ndarray:
    """Lower-triangular boolean mask (q, k)."""
    return jnp.tril(jnp.ones((seq_len, seq_len), dtype=jnp.bool_))


def sliding_window_mask(seq_len: int, window_size: int) -> jnp.ndarray:
    """Boolean mask (q, k): True where 0 <= q - k < window_size."""
    rows = jnp.arange(seq_len)[:, None]
    cols = jnp.arange(seq_len)[None, :]
    diff = rows - cols
    return (diff >= 0) & (diff < window_size)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Masked multi-head attention on (B, H, S_q, D) / (B, H, S_k, D).

    ``mask`` is boolean, broadcastable to (B, H, S_q, S_k); True = attend.
    Softmax is accumulated in float32 regardless of input dtype (the
    numerical-stability guard the reference lacks; SURVEY.md §7.3).
    """
    if scale is None:
        scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def causal_attention_ref(q, k, v, scale=None):
    s = q.shape[2]
    return mha_reference(q, k, v, mask=causal_mask(s)[None, None], scale=scale)


def sliding_window_attention_ref(q, k, v, window_size: int, scale=None):
    s = q.shape[2]
    m = sliding_window_mask(s, window_size)[None, None]
    return mha_reference(q, k, v, mask=m, scale=scale)
