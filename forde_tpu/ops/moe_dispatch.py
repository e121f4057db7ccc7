"""MoE routing / dispatch primitives.

Two dispatch strategies over a *stacked* expert parameterization (experts
are one (E, ...) tensor, so the FFN runs as a single batched einsum on the
MXU — never a Python list of per-expert Dense modules like the reference,
src/forde/moe.py:98-105):

  * ``dense_combine`` — every expert processes every token and the top-k
    outputs are mixed by a (tokens, E) combine matrix. Bit-for-bit the
    reference semantics (src/forde/moe.py:137-187) expressed as one einsum
    instead of per-k advanced-indexing gathers.
  * ``capacity_dispatch`` — production path: tokens are scattered to
    per-expert buffers of size ``capacity`` (dropping overflow), experts run
    on (E, C, D), and outputs are combined back. This is what expert
    parallelism shards over the ``expert`` mesh axis.

Gating and the load-balancing auxiliary loss match the reference exactly
(src/forde/moe.py:116-135, 189-222).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def top_k_gating(
    router_logits: jnp.ndarray, top_k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select top-k experts per token and renormalize their probabilities.

    Matches reference ``MoELayer._top_k_gating`` (src/forde/moe.py:116-135):
    ``lax.top_k`` over logits, then softmax over the selected logits.
    """
    top_k_logits, top_k_indices = jax.lax.top_k(router_logits, top_k)
    top_k_probs = jax.nn.softmax(top_k_logits, axis=-1)
    return top_k_indices, top_k_probs


def load_balancing_loss(
    router_probs: jnp.ndarray, top_k_indices: jnp.ndarray, num_experts: int
) -> jnp.ndarray:
    """Switch/Mixtral load-balance loss: E * sum_e(fraction_e * prob_e).

    Matches reference ``_load_balancing_loss`` (src/forde/moe.py:189-222)
    including the bincount-based token-fraction computation. The aux-loss
    weight is applied by the caller.
    """
    num_tokens = router_probs.shape[0] * router_probs.shape[1]
    top_k = top_k_indices.shape[-1]
    flat_indices = top_k_indices.reshape(-1)
    expert_counts = jnp.bincount(flat_indices, length=num_experts)
    fraction_per_expert = expert_counts / (num_tokens * top_k)
    prob_per_expert = router_probs.mean(axis=(0, 1))
    return num_experts * jnp.sum(fraction_per_expert * prob_per_expert)


def combine_matrix(
    top_k_indices: jnp.ndarray, top_k_probs: jnp.ndarray, num_experts: int
) -> jnp.ndarray:
    """Scatter top-k probabilities into a dense (..., num_experts) matrix.

    ``combine[..., e]`` is the routing weight of expert ``e`` for that token
    (zero if not selected). Summing duplicate selections matches the
    reference's accumulate-over-k semantics (src/forde/moe.py:169-185).
    """
    one_hot = jax.nn.one_hot(top_k_indices, num_experts, dtype=top_k_probs.dtype)
    return jnp.einsum("...ke,...k->...e", one_hot, top_k_probs)


def dense_combine(
    all_expert_outputs: jnp.ndarray, combine: jnp.ndarray
) -> jnp.ndarray:
    """Mix per-expert outputs (E, B, S, D) with combine weights (B, S, E)."""
    return jnp.einsum(
        "ebsd,bse->bsd", all_expert_outputs, combine.astype(all_expert_outputs.dtype)
    )


def capacity_dispatch(
    top_k_indices: jnp.ndarray,
    top_k_probs: jnp.ndarray,
    num_experts: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build dispatch/combine tensors for capacity-based routing.

    Args:
        top_k_indices: (T, K) expert index per token per slot (flattened
            tokens). Slot 0 has priority over slot 1, earlier tokens over
            later ones.
        top_k_probs: (T, K) renormalized routing weights.
        num_experts: E.
        capacity: C, max tokens per expert. Overflow tokens are dropped for
            that expert (their weight contributes nothing).

    Returns:
        dispatch: (T, E, C) one-hot float — token t occupies slot c of
            expert e.
        combine: (T, E, C) — dispatch scaled by routing weight.
    """
    t = top_k_indices.shape[0]
    k = top_k_indices.shape[1]
    sel = jax.nn.one_hot(top_k_indices, num_experts, dtype=jnp.float32)  # (T,K,E)

    # Priority: slot-major then token order. Count prior occupancy per expert.
    # flatten to (K*T, E) in slot-major order so slot 0 of every token comes
    # before slot 1 of any token.
    sel_km = sel.transpose(1, 0, 2).reshape(k * t, num_experts)
    positions_km = jnp.cumsum(sel_km, axis=0) - sel_km  # occupancy before me
    positions = positions_km.reshape(k, t, num_experts).transpose(1, 0, 2)  # (T,K,E)
    position_in_expert = jnp.sum(positions * sel, axis=-1).astype(jnp.int32)  # (T, K)
    keep = position_in_expert < capacity

    pos_one_hot = jax.nn.one_hot(
        position_in_expert, capacity, dtype=jnp.float32
    )  # (T, K, C)
    keep_f = keep.astype(jnp.float32)[..., None]
    dispatch = jnp.einsum("tke,tkc->tec", sel, pos_one_hot * keep_f)
    combine = jnp.einsum(
        "tke,tkc->tec", sel, pos_one_hot * keep_f * top_k_probs[..., None]
    )
    return dispatch, combine
