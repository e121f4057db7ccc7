"""Sensing: per-neuron and per-expert statistics (fast-loop accumulation).

Parity target: reference src/forde/sensing.py (hoyer_sparsity :5-32,
calculate_neuron_stats :34-69) and src/forde/moe_slow_loop.py
(calculate_expert_stats :34-88). All pure jnp and jittable; stats are
always computed in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def hoyer_sparsity(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Hoyer sparsity (sqrt(N) - L1/L2) / (sqrt(N) - 1) along ``axis``.

    Edge cases match the reference (sensing.py:20-32): all-zero vectors and
    N == 1 both yield 0.0.
    """
    x = x.astype(jnp.float32)
    n = x.shape[axis]
    l1 = jnp.sum(jnp.abs(x), axis=axis)
    l2 = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis))
    safe_l2 = jnp.where(l2 == 0, 1.0, l2)
    denom = jnp.sqrt(float(n)) - 1.0 if n > 1 else 1.0
    sparsity = (jnp.sqrt(float(n)) - l1 / safe_l2) / denom
    sparsity = jnp.where(l2 == 0, 0.0, sparsity)
    if n == 1:
        return jnp.zeros_like(sparsity)
    return sparsity


def calculate_neuron_stats(
    activations: jnp.ndarray, gradients: jnp.ndarray
) -> jnp.ndarray:
    """Per-neuron 5-vector [grad_gini, grad_gdp, act_gini, act_gdp, act_var].

    ``activations``/``gradients`` are (..., features); leading dims are
    flattened into one sample axis. Gini = Hoyer sparsity of each neuron's
    value distribution across samples, GDP = mean |value|
    (reference sensing.py:34-69 — there the per-neuron Hoyer runs via a
    vmap over the transposed matrix; here it is a single reduction along
    the sample axis, same math, one pass).
    """
    f = activations.shape[-1]
    acts = activations.reshape(-1, f).astype(jnp.float32)
    grads = gradients.reshape(-1, f).astype(jnp.float32)

    act_gini = hoyer_sparsity(acts, axis=0)
    act_gdp = jnp.mean(jnp.abs(acts), axis=0)
    act_var = jnp.var(acts, axis=0)
    grad_gini = hoyer_sparsity(grads, axis=0)
    grad_gdp = jnp.mean(jnp.abs(grads), axis=0)

    return jnp.stack([grad_gini, grad_gdp, act_gini, act_gdp, act_var], axis=-1)


def calculate_expert_stats(
    router_probs: jnp.ndarray, expert_outputs: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Per-expert 5-vector [usage_freq, usage_var, entropy, load_imbalance,
    selection_confidence] from (B, S, E) router probabilities
    (reference moe_slow_loop.py:34-88, including the quirk that entropy is
    the same scalar broadcast to every expert)."""
    probs = router_probs.astype(jnp.float32)
    num_experts = probs.shape[-1]
    eps = 1e-8

    usage_freq = probs.mean(axis=(0, 1))
    usage_var = probs.var(axis=(0, 1))
    entropy = -(probs * jnp.log(probs + eps)).sum(axis=-1).mean(axis=(0, 1))
    entropy_per_expert = jnp.full((num_experts,), entropy)
    load_imbalance = jnp.abs(usage_freq - 1.0 / num_experts)
    max_mask = probs == probs.max(axis=-1, keepdims=True)
    selection_confidence = jnp.where(max_mask, probs, 0.0).sum(axis=(0, 1)) / (
        max_mask.sum(axis=(0, 1)) + eps
    )

    return jnp.stack(
        [usage_freq, usage_var, entropy_per_expert, load_imbalance,
         selection_confidence],
        axis=-1,
    )
