"""Encoder-side attention + the FORDE transformer block for the two towers.

Block spec per reference README.md:39-45:
    self-attention -> add/norm -> StatefulLayer -> add/norm
(pre-norm variant, matching the decoder path's convention).

Both towers run the fused-qkv Pallas flash kernel (ops/flash_attention.
flash_mha): q/k/v are read straight out of the qkv projection output and
the context is written back in (B, S, H*D) layout — no head split/merge
transposes (those copies alone were ~7.5 GB/step at ViT-B/128, PERF.md).
The text tower's BERT-style padding (right-padded input_ids/attention_mask,
reference download_to_drive.py:52-64) maps to the kernel's per-sample
``kv_lens`` masking.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from forde_tpu.nn.stateful import StatefulLayer
from forde_tpu.ops.flash_attention import flash_mha


class EncoderSelfAttention(nn.Module):
    """Bidirectional multi-head self-attention (zero-transpose flash path)."""

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
        kv_lens = None
        if key_padding_mask is not None:
            # Right-padded contract: valid tokens form a prefix, so the
            # mask reduces to a per-sample length.
            kv_lens = jnp.sum(key_padding_mask.astype(jnp.int32), axis=-1)
        out = flash_mha(
            qkv, self.num_heads, self.head_dim,
            causal=False, kv_lens=kv_lens, impl=self.impl,
        )
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
