"""FORDE decoder-only language model.

Parity target: reference src/forde/model.py (DecoderBlock :72-199,
FORDEDecoderLM :202-294, FORDEDecoderLMWithLoss :297-346). Same macro
structure — token + learned positional embeddings, pre-norm blocks of
[NSA-or-causal attention, mHC-or-plain residual, MoE-or-dense FFN,
mHC-or-plain residual], final norm, stream collapse, lm_head — with the
TPU-first internals from forde_tpu.nn (flash attention, stacked-expert
einsum MoE, fused stream expansion).

Fixes the reference's latent NameError in FORDEDecoderLMWithLoss (optax was
only imported under __main__, model.py:339 vs :374).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import optax
from flax import linen as nn
from jax.sharding import Mesh

from forde_tpu.core.config import LLMConfig, create_default_config  # noqa: F401
from forde_tpu.nn.attention import CausalSelfAttention, NativeSparseAttention
from forde_tpu.nn.hyper_connections import (
    HyperConnectionStream,
    ManifoldHyperConnection,
    StreamCollapser,
)
from forde_tpu.nn.moe import MoEStatefulLayer


class DecoderBlock(nn.Module):
    """Pre-norm decoder block (reference model.py:72-199).

    ``mesh`` (optional) enables the explicit-parallel paths: shard_map EP
    for MoE (config.moe_dispatch == "ep") and ring attention over the
    mesh's ``context`` axis for the dense-attention sublayer.
    """

    config: LLMConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        streams: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode: bool = False,
        positions: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        cfg = self.config
        dtype = cfg.dtypes.compute

        if cfg.use_hyper_connections:
            if streams is None:
                # Per-block fallback (reference model.py:109-117); unreachable
                # in the normal model path but part of the module contract.
                streams = HyperConnectionStream(
                    num_streams=cfg.num_streams,
                    d_model=cfg.d_model,
                    dtype=dtype,
                    name="stream_init",
                )(x)
            working_input = streams[:, :, 0, :]
        else:
            working_input = x

        # ----- attention sublayer -----
        attn_input = nn.LayerNorm(name="attn_norm", dtype=dtype)(working_input)
        if cfg.use_sparse_attention:
            attn_output = NativeSparseAttention(
                num_heads=cfg.num_heads,
                head_dim=cfg.head_dim,
                window_size=cfg.window_size,
                compression_ratio=cfg.compression_ratio,
                top_k_global=cfg.top_k_global,
                impl=cfg.attention_impl,
                dtype=dtype,
                max_decode_len=cfg.max_seq_len,
                mesh=self.mesh,
                name="sparse_attention",
            )(
                attn_input, mask, decode=decode, positions=positions,
                lengths=lengths,
            )
        else:
            attn_output = CausalSelfAttention(
                num_heads=cfg.num_heads,
                head_dim=cfg.head_dim,
                impl=cfg.attention_impl,
                dtype=dtype,
                max_decode_len=cfg.max_seq_len,
                mesh=self.mesh,
                quantized=cfg.quantized,
                name="causal_attention",
            )(attn_input, mask, decode=decode, positions=positions)

        if not deterministic:
            attn_output = nn.Dropout(rate=cfg.dropout_rate)(
                attn_output, deterministic=deterministic
            )

        if cfg.use_hyper_connections:
            streams, working_input = ManifoldHyperConnection(
                num_streams=cfg.num_streams,
                sinkhorn_iterations=cfg.sinkhorn_iterations,
                name="mhc_attn",
            )(streams, attn_output, output_stream_idx=0)
        else:
            working_input = working_input + attn_output

        # ----- FFN / MoE sublayer -----
        ffn_input = nn.LayerNorm(name="ffn_norm", dtype=dtype)(working_input)
        if cfg.use_moe:
            ffn_output, moe_aux_loss = MoEStatefulLayer(
                num_experts=cfg.num_experts,
                top_k=cfg.top_k_experts,
                expert_hidden_dim=cfg.expert_hidden_dim,
                d_model=cfg.d_model,
                aux_loss_weight=cfg.moe_aux_loss_weight,
                dispatch=cfg.moe_dispatch,
                capacity_factor=cfg.moe_capacity_factor,
                dtype=dtype,
                mesh=self.mesh,
                quantized=cfg.quantized,
                name="moe",
            )(ffn_input)
        else:
            if cfg.quantized:
                from forde_tpu.ops.quant import QDense as FFNDense
            else:
                FFNDense = nn.Dense
            ffn_output = FFNDense(cfg.expert_hidden_dim, name="ffn_up", dtype=dtype)(
                ffn_input
            )
            ffn_output = nn.gelu(ffn_output)
            ffn_output = FFNDense(cfg.d_model, name="ffn_down", dtype=dtype)(
                ffn_output
            )
            moe_aux_loss = jnp.array(0.0)

        if not deterministic:
            ffn_output = nn.Dropout(rate=cfg.dropout_rate)(
                ffn_output, deterministic=deterministic
            )

        if cfg.use_hyper_connections:
            streams, output = ManifoldHyperConnection(
                num_streams=cfg.num_streams,
                sinkhorn_iterations=cfg.sinkhorn_iterations,
                name="mhc_ffn",
            )(streams, ffn_output, output_stream_idx=0)
        else:
            output = working_input + ffn_output
            streams = None

        return output, streams, moe_aux_loss


class _ScanBlockBody(nn.Module):
    """nn.scan adapter: carry = (x, streams); per-layer output = aux loss.

    Masks are not threaded through the scanned path (the training driver
    never passes one, matching reference usage). ``decode=True`` threads
    the KV-cache path through the scan — the cache collection carries a
    leading (L,) axis (variable_axes in FORDEDecoderLM), so serving
    compiles ONE block instead of num_layers unrolled copies.
    """

    config: LLMConfig
    deterministic: bool = True
    mesh: Optional[Mesh] = None
    decode: bool = False

    @nn.compact
    def __call__(self, carry, _):
        # positions (per-row ragged decode) and lengths (ragged NSA
        # prefill forward) ride the carry unchanged so every scanned
        # layer sees the same (B,) vector (None otherwise).
        x, streams, positions, lengths = carry
        x, streams, aux = DecoderBlock(
            config=self.config, mesh=self.mesh, name="block"
        )(x, streams, None, self.deterministic, self.decode, positions,
          lengths)
        return (x, streams, positions, lengths), aux


class FORDEDecoderLM(nn.Module):
    """Decoder-only LM with MoE + NSA + mHC (reference model.py:202-294).

    Returns (logits, total_aux_loss).
    """

    config: LLMConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        decode: bool = False,
        positions: Optional[jnp.ndarray] = None,
        lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``positions`` (B,), decode-only: per-row position of the single
        token being fed — the ragged-batch serving path (mixed-length
        right-padded prompts share one compiled program; see
        models/generate.generate_ragged). Works for dense-causal AND NSA
        configs (NSA branch caches are all per-row; its traced
        length-gates read the per-row position).

        ``lengths`` (B,), training-mode-only: the RAGGED NSA forward —
        ``input_ids`` is right-padded and row i's true length is
        ``lengths[i]``; every position < lengths[i] computes exactly what
        a per-row exact-length forward would (nn/attention.
        NativeSparseAttention). The padded one-compile NSA prefill
        (models/generate.nsa_prefill) rides on this."""
        cfg = self.config
        dtype = cfg.dtypes.compute
        b, s = input_ids.shape

        token_embedding = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.d_model,
            dtype=dtype,
            name="token_embed",
        )(input_ids)
        if decode:
            # position counter lives in the cache collection
            pos_index = self.variable(
                "cache", "pos_index", lambda: jnp.array(0, jnp.int32)
            )
            offset = pos_index.value
            if not self.is_initializing():
                pos_index.value = offset + s
            if positions is not None:
                position_ids = positions[:, None] + jnp.arange(s)[None, :]
            else:
                position_ids = (offset + jnp.arange(s))[None, :]
        else:
            position_ids = jnp.arange(s)[None, :]
        position_embedding = nn.Embed(
            num_embeddings=cfg.max_seq_len,
            features=cfg.d_model,
            dtype=dtype,
            name="pos_embed",
        )(position_ids)
        x = token_embedding + position_embedding

        if not deterministic:
            x = nn.Dropout(rate=cfg.dropout_rate)(x, deterministic=deterministic)

        streams = None
        if cfg.use_hyper_connections:
            streams = HyperConnectionStream(
                num_streams=cfg.num_streams,
                d_model=cfg.d_model,
                dtype=dtype,
                name="initial_streams",
            )(x)

        total_aux_loss = jnp.array(0.0)
        if cfg.scan_layers:
            # One traced block scanned over a leading (L,) param axis —
            # the HLO is a single layer + a loop, so compile time stops
            # scaling with depth. stats_buffer leaves also gain the (L,)
            # axis (the slow loop handles both layouts).
            body_cls = _ScanBlockBody
            if cfg.remat:
                body_cls = nn.remat(
                    _ScanBlockBody,
                    prevent_cse=False,  # safe under scan
                )
            scan_cls = nn.scan(
                body_cls,
                # cache + intermediates also gain the (L,) axis, so the
                # KV-cache decode path (and nsa_prefill's capture) work
                # under scan — serving compiles one block, not L copies.
                variable_axes={
                    "params": 0,
                    "stats_buffer": 0,
                    "cache": 0,
                    "intermediates": 0,
                },
                split_rngs={"params": True},
                length=cfg.num_layers,
            )
            (x, streams, _, _), aux_stack = scan_cls(
                config=cfg, deterministic=deterministic, mesh=self.mesh,
                decode=decode, name="layers",
            )((x, streams, positions, lengths), None)
            total_aux_loss = total_aux_loss + jnp.sum(aux_stack)
        else:
            block_cls = DecoderBlock
            if cfg.remat:
                block_cls = nn.remat(DecoderBlock, static_argnums=(4, 5))
            for layer_idx in range(cfg.num_layers):
                x, streams, moe_aux_loss = block_cls(
                    config=cfg, mesh=self.mesh, name=f"layer_{layer_idx}"
                )(x, streams, mask, deterministic, decode, positions,
                  lengths)
                total_aux_loss = total_aux_loss + moe_aux_loss

        # Deliberate deviation from the reference: model.py:276-285 applies
        # final_norm to x and then *discards* the result by overwriting x
        # with the collapsed streams, so lm_head sees unnormalized
        # activations whenever mHC is on (a likely contributor to the
        # reference's NaN run, SURVEY.md §6). Here we collapse first and
        # normalize what actually feeds lm_head. config.reference_quirks
        # restores the reference ordering bit-exactly (final_norm computed
        # on x and dropped; lm_head fed the raw collapsed streams) so
        # weight transplants match at 1e-5 with mHC on too.
        if cfg.use_hyper_connections and streams is not None:
            if cfg.reference_quirks:
                # Reference model.py:276-285: the norm is computed (its
                # params exist and receive gradients of exactly zero) but
                # never reaches lm_head. XLA dead-code-eliminates the
                # computation; the param tree stays transplant-identical.
                _ = nn.LayerNorm(name="final_norm", dtype=dtype)(x)
                x = StreamCollapser(
                    d_model=cfg.d_model,
                    collapse_method="weighted_sum",
                    dtype=dtype,
                    name="stream_collapser",
                )(streams)
            else:
                x = StreamCollapser(
                    d_model=cfg.d_model,
                    collapse_method="weighted_sum",
                    dtype=dtype,
                    name="stream_collapser",
                )(streams)
                x = nn.LayerNorm(name="final_norm", dtype=dtype)(x)
        else:
            x = nn.LayerNorm(name="final_norm", dtype=dtype)(x)

        if cfg.quantized:
            from forde_tpu.ops.quant import QDense

            logits = QDense(cfg.vocab_size, name="lm_head", dtype=dtype)(x)
        else:
            logits = nn.Dense(
                cfg.vocab_size,
                name="lm_head",
                kernel_init=nn.initializers.normal(stddev=0.02),
                dtype=dtype,
            )(x)
        return logits.astype(jnp.float32), total_aux_loss


class FORDEDecoderLMWithLoss(nn.Module):
    """Convenience wrapper adding shifted next-token CE loss
    (reference model.py:297-346, with the optax import bug fixed)."""

    config: LLMConfig
    mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        labels: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        logits, aux_loss = FORDEDecoderLM(
            config=self.config, mesh=self.mesh, name="decoder"
        )(input_ids, mask, deterministic)
        if labels is not None:
            shift_logits = logits[:, :-1, :]
            shift_labels = labels[:, 1:]
            lm_loss = optax.softmax_cross_entropy_with_integer_labels(
                shift_logits.reshape(-1, self.config.vocab_size),
                shift_labels.reshape(-1),
            ).mean()
        else:
            lm_loss = jnp.array(0.0)
        return logits, lm_loss, aux_loss


if __name__ == "__main__":
    # Module smoke test (reference model.py:373-455 pattern).
    import jax

    cfg = create_default_config()
    model = FORDEDecoderLM(config=cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0, cfg.vocab_size)
    variables = model.init(jax.random.PRNGKey(42), ids)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    (logits, aux), _ = model.apply(variables, ids, mutable=["stats_buffer"])
    assert logits.shape == (2, 64, cfg.vocab_size)
    print(f"FORDEDecoderLM OK: {n_params:,} params, logits {logits.shape}, "
          f"aux {float(aux):.6f}")
