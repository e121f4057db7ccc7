"""Attention modules: Native Sparse Attention and dense causal attention.

Behavioral parity with the reference (src/forde/sparse_attention.py), but the
local/causal branches run on the Pallas flash kernel instead of
materializing (B, H, S, S) scores, and softmax always accumulates in fp32.

Preserved reference quirks (these are *behavior*, per SURVEY.md §7.3):
  * top-k selection is global per sequence, not per query
    (sparse_attention.py:441)
  * compressed branch pools the first num_pools*ratio positions via
    modular indexing, with a pool-granularity causal mask
    (sparse_attention.py:383-421)
  * branch combination is local + sigmoid(gate_c)*compressed +
    sigmoid(gate_t)*topk with hard on/off masks for short sequences
    (sparse_attention.py:346-363)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from forde_tpu.core.mesh import AXIS_CONTEXT
from forde_tpu.ops import attention_ref
from forde_tpu.ops.attention_ref import causal_mask, sliding_window_mask
from forde_tpu.ops.flash_attention import flash_attention
from forde_tpu.ops.nsa_attention import small_kv_attention


def create_causal_mask(seq_len: int) -> jnp.ndarray:
    """Lower-triangular boolean mask (reference sparse_attention.py:22-24)."""
    return causal_mask(seq_len)


def create_sliding_window_mask(seq_len: int, window_size: int) -> jnp.ndarray:
    """Causal window mask: 0 <= q - k < window
    (reference sparse_attention.py:27-48)."""
    return sliding_window_mask(seq_len, window_size)


def _split_heads(x, num_heads, head_dim):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class SlidingWindowAttention(nn.Module):
    """Causal sliding-window attention (reference sparse_attention.py:51-104),
    computed with the block-sparse flash kernel — work outside the window is
    skipped, not masked."""

    num_heads: int
    head_dim: int
    window_size: int = 512
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, s, d_model = x.shape
        qkv = nn.Dense(
            3 * self.num_heads * self.head_dim, name="qkv_proj", dtype=self.dtype
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)
        out = flash_attention(
            q, k, v, causal=True, window_size=self.window_size, impl=self.impl
        )
        out = _merge_heads(out)
        return nn.Dense(d_model, name="out_proj", dtype=self.dtype)(out)


class CausalSelfAttention(nn.Module):
    """Dense causal attention fallback (reference sparse_attention.py:483-518).

    ``decode=True`` enables KV-cache autoregressive decoding (a capability
    the reference lacks entirely): a prefill call (S > 1) fills the cache
    and sets the index; subsequent single-token calls append and attend to
    the cached prefix. ``max_decode_len`` bounds the cache.
    """

    num_heads: int
    head_dim: int
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    max_decode_len: int = 2048
    # Context parallelism: when the mesh's ``context`` axis is >1, the
    # sequence dimension arrives sharded over it and attention runs as
    # ring attention over ICI (parallel/ring_attention.py) instead of the
    # single-chip flash kernel.
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self, x, mask: Optional[jnp.ndarray] = None, decode: bool = False
    ):
        b, s, d_model = x.shape
        qkv = nn.Dense(
            3 * self.num_heads * self.head_dim, name="qkv_proj", dtype=self.dtype
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        if decode:
            cache_shape = (b, self.num_heads, self.max_decode_len, self.head_dim)
            cached_key = self.variable(
                "cache", "cached_key", jnp.zeros, cache_shape, k.dtype
            )
            cached_value = self.variable(
                "cache", "cached_value", jnp.zeros, cache_shape, v.dtype
            )
            cache_index = self.variable(
                "cache", "cache_index", lambda: jnp.array(0, jnp.int32)
            )
            if not self.is_initializing():
                idx = cache_index.value
                keys = jax.lax.dynamic_update_slice(
                    cached_key.value, k, (0, 0, idx, 0)
                )
                values = jax.lax.dynamic_update_slice(
                    cached_value.value, v, (0, 0, idx, 0)
                )
                cached_key.value = keys
                cached_value.value = values
                cache_index.value = idx + s
                # attend to everything written so far, causally within the
                # new chunk: valid iff k_pos <= idx + (local q offset)
                q_pos = idx + jnp.arange(s)[:, None]
                k_pos = jnp.arange(self.max_decode_len)[None, :]
                attn_mask = (k_pos <= q_pos)[None, None]
                out = attention_ref.mha_reference(q, keys, values, mask=attn_mask)
            else:
                out = jnp.zeros_like(q)
        elif (
            self.mesh is not None
            and self.mesh.shape.get(AXIS_CONTEXT, 1) > 1
        ):
            from forde_tpu.parallel.ring_attention import ring_attention

            out = ring_attention(q, k, v, self.mesh, causal=True)
        else:
            out = flash_attention(q, k, v, causal=True, impl=self.impl)
        out = _merge_heads(out)
        return nn.Dense(d_model, name="out_proj", dtype=self.dtype)(out)


class NativeSparseAttention(nn.Module):
    """Three-branch NSA (reference sparse_attention.py:279-480).

    local (sliding-window flash) + gated compressed-global + gated top-k.
    """

    num_heads: int = 8
    head_dim: int = 64
    window_size: int = 512
    compression_ratio: int = 8
    top_k_global: int = 64
    use_compressed: bool = True
    use_top_k: bool = True
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        b, s, d_model = x.shape

        output = SlidingWindowAttention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            window_size=self.window_size,
            impl=self.impl,
            dtype=self.dtype,
            name="local_attention",
        )(x, mask)

        # Static short-sequence gates (reference sparse_attention.py:331-332, 362)
        local_window_start = s - self.window_size
        has_global_context = local_window_start > self.compression_ratio

        if self.use_compressed:
            compressed = self._compressed_global(x)
            gate_c = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_compressed", dtype=self.dtype)(x)
            )
            use_mask = 1.0 if has_global_context else 0.0
            output = output + use_mask * gate_c * compressed

        if self.use_top_k:
            topk = self._top_k(x)
            gate_t = jax.nn.sigmoid(
                nn.Dense(d_model, name="gate_top_k", dtype=self.dtype)(x)
            )
            use_mask = 1.0 if s > self.window_size else 0.0
            output = output + use_mask * gate_t * topk

        return output

    def _compressed_global(self, x: jnp.ndarray) -> jnp.ndarray:
        """Coarse branch: mean-pool early positions into summaries, attend
        with a pool-granular causal mask (reference :367-429)."""
        b, s, d_model = x.shape
        max_global_len = max(s - self.window_size, self.compression_ratio)
        num_pools = max(max_global_len // self.compression_ratio, 1)
        truncated_len = num_pools * self.compression_ratio

        # Modular indexing quirk preserved: positions wrap past seq_len.
        pool_indices = jnp.arange(truncated_len) % s
        global_tokens = jnp.take(x, pool_indices, axis=1)
        compressed = global_tokens.reshape(
            b, num_pools, self.compression_ratio, d_model
        ).mean(axis=2)

        q = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_q_proj", dtype=self.dtype
        )(x)
        k = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_k_proj", dtype=self.dtype
        )(compressed)
        v = nn.Dense(
            self.num_heads * self.head_dim, name="compressed_v_proj", dtype=self.dtype
        )(compressed)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        # Pool p is visible to queries at positions >= (p+1)*ratio — the
        # pool-granular causal mask, expressed as per-key thresholds for
        # the fused small-KV kernel (scores never materialize in HBM).
        pool_ends = (jnp.arange(num_pools) + 1) * self.compression_ratio
        key_pos = jnp.broadcast_to(pool_ends[None, :], (b, num_pools))
        out = small_kv_attention(q, k, v, key_pos, impl=self.impl)
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="compressed_out_proj", dtype=self.dtype)(out)

    def _top_k(self, x: jnp.ndarray) -> jnp.ndarray:
        """Fine branch: learned importance scores pick k tokens globally per
        sequence; attend with index-based causal mask (reference :431-480)."""
        b, s, d_model = x.shape
        k_sel = min(self.top_k_global, s)

        importance = nn.Dense(1, name="importance_scorer", dtype=self.dtype)(
            x
        ).squeeze(-1)
        _, top_k_indices = jax.lax.top_k(importance, k_sel)  # (b, k) global per seq

        batch_idx = jnp.arange(b)[:, None]
        selected = x[batch_idx, top_k_indices, :]  # (b, k, d_model)

        q = nn.Dense(
            self.num_heads * self.head_dim, name="topk_q_proj", dtype=self.dtype
        )(x)
        kk = nn.Dense(
            self.num_heads * self.head_dim, name="topk_k_proj", dtype=self.dtype
        )(selected)
        vv = nn.Dense(
            self.num_heads * self.head_dim, name="topk_v_proj", dtype=self.dtype
        )(selected)
        q = _split_heads(q, self.num_heads, self.head_dim)
        kk = _split_heads(kk, self.num_heads, self.head_dim)
        vv = _split_heads(vv, self.num_heads, self.head_dim)

        # Selected token j is visible to queries at positions >= its source
        # index (the reference's index-based causal mask), fused so the
        # (B, H, S, k) scores stay in VMEM.
        out = small_kv_attention(q, kk, vv, top_k_indices, impl=self.impl)
        out = _merge_heads(out).astype(x.dtype)
        return nn.Dense(d_model, name="topk_out_proj", dtype=self.dtype)(out)
