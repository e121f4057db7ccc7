"""Standalone NSA branch modules: CompressedGlobalAttention, TopKSelection.

API parity with the reference's standalone modules
(src/forde/sparse_attention.py:107-191, 194-276). The composed
``NativeSparseAttention`` uses its own inline branch implementations (as
the reference does — its standalone modules are duplicated logic the
composed class does not call, SURVEY.md §2 row 6); these exist for users
and tests that exercise the branches in isolation
(reference tests/test_moe.py:90-103, tests/test_topk_usage.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from forde_tpu.nn.attention import _merge_heads, _split_heads


class CompressedGlobalAttention(nn.Module):
    """Attend to mean-pooled summaries of tokens before the local window
    (reference sparse_attention.py:107-191). Unlike the inline NSA branch,
    ``local_window_start`` is a real (static) argument here and short
    contexts return zeros."""

    num_heads: int
    head_dim: int
    compression_ratio: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, local_window_start: int) -> jnp.ndarray:
        b, s, d_model = x.shape
        if local_window_start <= self.compression_ratio:
            return jnp.zeros_like(x)
        num_pools = local_window_start // self.compression_ratio
        if num_pools == 0:
            return jnp.zeros_like(x)
        truncated = num_pools * self.compression_ratio
        compressed = x[:, :truncated, :].reshape(
            b, num_pools, self.compression_ratio, d_model
        ).mean(axis=2)

        q = nn.Dense(self.num_heads * self.head_dim, name="q_proj",
                     dtype=self.dtype)(x)
        k = nn.Dense(self.num_heads * self.head_dim, name="k_proj",
                     dtype=self.dtype)(compressed)
        v = nn.Dense(self.num_heads * self.head_dim, name="v_proj",
                     dtype=self.dtype)(compressed)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        scale = 1.0 / jnp.sqrt(self.head_dim)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        query_positions = jnp.arange(s)[None, None, :, None]
        pool_ends = ((jnp.arange(num_pools) + 1) * self.compression_ratio)[
            None, None, None, :
        ]
        scores = jnp.where(query_positions >= pool_ends, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", weights, v))
        return nn.Dense(d_model, name="out_proj", dtype=self.dtype)(
            out.astype(x.dtype)
        )


class TopKSelection(nn.Module):
    """Learned-importance global top-k token selection + attention
    (reference sparse_attention.py:194-276). Returns (output, indices)."""

    num_heads: int
    head_dim: int
    top_k: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, importance_scores: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, s, d_model = x.shape
        if importance_scores is None:
            importance_scores = nn.Dense(
                1, name="importance_scorer", dtype=self.dtype
            )(x).squeeze(-1)
        k_sel = min(self.top_k, s)
        _, top_k_indices = jax.lax.top_k(
            importance_scores.astype(jnp.float32), k_sel
        )

        batch_idx = jnp.arange(b)[:, None]
        selected = x[batch_idx, top_k_indices, :]

        q = nn.Dense(self.num_heads * self.head_dim, name="q_proj",
                     dtype=self.dtype)(x)
        kk = nn.Dense(self.num_heads * self.head_dim, name="k_proj",
                      dtype=self.dtype)(selected)
        vv = nn.Dense(self.num_heads * self.head_dim, name="v_proj",
                      dtype=self.dtype)(selected)
        q = _split_heads(q, self.num_heads, self.head_dim)
        kk = _split_heads(kk, self.num_heads, self.head_dim)
        vv = _split_heads(vv, self.num_heads, self.head_dim)

        scale = 1.0 / jnp.sqrt(self.head_dim)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, kk, preferred_element_type=jnp.float32
        ) * scale
        query_pos = jnp.arange(s)[None, None, :, None]
        key_pos = top_k_indices[:, None, None, :]
        scores = jnp.where(query_pos >= key_pos, scores, -1e9)
        weights = jax.nn.softmax(scores, axis=-1).astype(vv.dtype)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", weights, vv))
        out = nn.Dense(d_model, name="out_proj", dtype=self.dtype)(
            out.astype(x.dtype)
        )
        return out, top_k_indices
