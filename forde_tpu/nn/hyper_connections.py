"""Manifold-constrained hyper-connections (multi-stream residuals).

Parity target: reference src/forde/hyper_connections.py. The mixing matrix
is a learned (S, S) logits parameter projected to the doubly-stochastic
manifold by Sinkhorn-Knopp (exp/temperature variant — the one the reference
model actually uses at hyper_connections.py:174).

TPU-first difference: stream expansion is a single fused Dense to
(num_streams-1)*d (one MXU matmul) instead of a Python loop of per-stream
Dense modules (reference hyper_connections.py:109-124); math is equivalent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from forde_tpu.ops.sinkhorn import sinkhorn_knopp_exp


class HyperConnectionStream(nn.Module):
    """Expand (B, S, D) into (B, S, num_streams, D): stream 0 is the
    identity/residual path, the rest are learned projections
    (reference hyper_connections.py:83-124)."""

    num_streams: int = 4
    d_model: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, d = x.shape
        if self.num_streams == 1:
            return x[:, :, None, :]
        projected = nn.Dense(
            (self.num_streams - 1) * d,
            name="stream_init",
            kernel_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
        )(x)
        projected = projected.reshape(b, s, self.num_streams - 1, d)
        return jnp.concatenate([x[:, :, None, :], projected], axis=2)


class ManifoldHyperConnection(nn.Module):
    """Mix streams with a doubly-stochastic matrix, inject the sublayer
    output into one stream, and read that stream back out
    (reference hyper_connections.py:127-196)."""

    num_streams: int = 4
    sinkhorn_iterations: int = 5
    temperature: float = 1.0

    @nn.compact
    def __call__(
        self,
        streams: jnp.ndarray,
        sublayer_output: jnp.ndarray,
        output_stream_idx: int = 0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_streams = streams.shape[2]
        mixing_logits = self.param(
            "mixing_logits",
            nn.initializers.normal(stddev=0.1),
            (num_streams, num_streams),
        )
        mixing_matrix = sinkhorn_knopp_exp(
            mixing_logits,
            num_iterations=self.sinkhorn_iterations,
            temperature=self.temperature,
        ).astype(streams.dtype)

        mixed = jnp.einsum("ij,bsjd->bsid", mixing_matrix, streams)
        mixed = mixed.at[:, :, output_stream_idx, :].add(
            sublayer_output.astype(mixed.dtype)
        )
        output = mixed[:, :, output_stream_idx, :]
        return mixed, output


class ManifoldHyperConnectionBlock(nn.Module):
    """Sublayer wrapper: pre-norm the designated stream, run the sublayer,
    mix via mHC (reference hyper_connections.py:208-252 — dead code there,
    the model wires mHC manually; provided here for API parity and for
    users composing custom blocks)."""

    num_streams: int = 4
    sinkhorn_iterations: int = 5
    d_model: int = 512

    @nn.compact
    def __call__(
        self, streams: jnp.ndarray, sublayer_fn, output_stream_idx: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sublayer_input = streams[:, :, output_stream_idx, :]
        normalized = nn.LayerNorm(name="layer_norm")(sublayer_input)
        sublayer_output = sublayer_fn(normalized)
        return ManifoldHyperConnection(
            num_streams=self.num_streams,
            sinkhorn_iterations=self.sinkhorn_iterations,
            name="mhc",
        )(streams, sublayer_output, output_stream_idx)


class StreamCollapser(nn.Module):
    """Collapse (B, S, N, D) streams to (B, S, D)
    (reference hyper_connections.py:255-294)."""

    d_model: int
    collapse_method: str = "weighted_sum"  # "weighted_sum" | "concat" | "first"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, streams: jnp.ndarray) -> jnp.ndarray:
        b, s, n, d = streams.shape
        if self.collapse_method == "first":
            return streams[:, :, 0, :]
        if self.collapse_method == "concat":
            concat = streams.reshape(b, s, n * d)
            return nn.Dense(self.d_model, name="collapse_proj", dtype=self.dtype)(
                concat
            )
        weights = self.param("stream_weights", nn.initializers.ones, (n,))
        normalized = jax.nn.softmax(weights).astype(streams.dtype)
        return jnp.einsum("bsnd,n->bsd", streams, normalized)
