"""Encoder-side attention + the FORDE transformer block for the two towers.

Block spec per reference README.md:39-45:
    self-attention -> add/norm -> StatefulLayer -> add/norm
(pre-norm variant, matching the decoder path's convention).

Bidirectional attention runs on the Pallas flash kernel when the key set is
uniform (vision tower: every position valid); with a per-sample key padding
mask (text tower, BERT-style input_ids/attention_mask) it uses the fp32
masked reference path — text sequences are <= 64 tokens
(reference download_to_drive.py:52-64), so O(S^2) there is noise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from forde_tpu.nn.attention import _merge_heads, _split_heads
from forde_tpu.nn.stateful import StatefulLayer
from forde_tpu.ops import attention_ref
from forde_tpu.ops.flash_attention import flash_attention


class EncoderSelfAttention(nn.Module):
    """Bidirectional multi-head self-attention."""

    num_heads: int
    head_dim: int
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, key_padding_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, s, d_model = x.shape
        qkv = nn.Dense(
            3 * self.num_heads * self.head_dim, name="qkv_proj", dtype=self.dtype
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _split_heads(q, self.num_heads, self.head_dim)
        k = _split_heads(k, self.num_heads, self.head_dim)
        v = _split_heads(v, self.num_heads, self.head_dim)

        if key_padding_mask is None:
            out = flash_attention(q, k, v, causal=False, impl=self.impl)
        else:
            mask = key_padding_mask[:, None, None, :].astype(jnp.bool_)
            out = attention_ref.mha_reference(q, k, v, mask=mask)

        out = _merge_heads(out)
        return nn.Dense(d_model, name="out_proj", dtype=self.dtype)(out)


class FORDETransformerBlock(nn.Module):
    """Pre-norm: LN -> attention -> residual; LN -> StatefulLayer -> residual
    (reference README.md:42-45)."""

    num_heads: int
    head_dim: int
    mlp_hidden_dim: int
    d_model: int
    specialist_gate: float = 0.1
    stateful_impl: str = "auto"
    attention_impl: str = "auto"
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    sense: bool = True
    # Selective remat: recompute ONLY the StatefulLayer in the backward
    # (its two (B, S, mlp_hidden) intermediates are the largest per-block
    # tensors); attention residuals stay saved. Cheaper than whole-block
    # remat (which recomputes attention too, measured -23%).
    remat_mlp: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn_out = EncoderSelfAttention(
            num_heads=self.num_heads,
            head_dim=self.head_dim,
            impl=self.attention_impl,
            dtype=self.dtype,
            name="attention",
        )(nn.LayerNorm(name="attn_norm", dtype=self.dtype)(x), key_padding_mask)
        if not deterministic:
            attn_out = nn.Dropout(rate=self.dropout_rate)(
                attn_out, deterministic=deterministic
            )
        x = x + attn_out

        stateful_cls = StatefulLayer
        if self.remat_mlp:
            stateful_cls = nn.remat(StatefulLayer, prevent_cse=False)
        mlp_out = stateful_cls(
            hidden_dim=self.mlp_hidden_dim,
            d_model=self.d_model,
            specialist_gate=self.specialist_gate,
            impl=self.stateful_impl,
            dtype=self.dtype,
            sense=self.sense,
            name="stateful",
        )(nn.LayerNorm(name="mlp_norm", dtype=self.dtype)(x))
        if not deterministic:
            mlp_out = nn.Dropout(rate=self.dropout_rate)(
                mlp_out, deterministic=deterministic
            )
        return x + mlp_out
