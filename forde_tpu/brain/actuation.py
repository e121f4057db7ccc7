"""Actuation: pure pytree transforms that rewrite the network's function.

Parity target: reference src/forde/moe_slow_loop.py
(compute_router_adjustments :211-250; router-bias surgery :383-439; buffer
reset :441-451). Everything here is a pure function of (params, stats) —
jittable, donate-able, and resharding-safe under pjit (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze


def compute_router_adjustments(
    expert_assignments: jnp.ndarray,
    expert_usage: jnp.ndarray,
    target_balance: float = 0.1,
    max_adjustment: float = 0.1,
    specialist_damping: float = 0.5,
) -> jnp.ndarray:
    """Router bias nudges: push under-used experts up, over-used down,
    clipped to +-max_adjustment, damped for the specialist cluster (==1)
    (reference moe_slow_loop.py:211-250)."""
    num_experts = expert_usage.shape[0]
    deviation = expert_usage - 1.0 / num_experts
    adjustments = jnp.clip(
        -deviation * target_balance, -max_adjustment, max_adjustment
    )
    specialist_mask = expert_assignments == 1
    return jnp.where(specialist_mask, adjustments * specialist_damping, adjustments)


def apply_router_adjustments(params, adjustments: jnp.ndarray) -> Tuple[dict, int]:
    """Add ``adjustments`` to every router bias of matching shape.

    Matches leaves whose flattened path contains both 'router_linear' and
    'bias' (reference moe_slow_loop.py:418-439). Path matching is static
    structure, so this stays jittable. Returns (new_params, update_count).
    """
    flat = traverse_util.flatten_dict(unfreeze(params))
    count = 0
    out = {}
    num_experts = adjustments.shape[0]
    for path, leaf in flat.items():
        if "router_linear" in path and "bias" in path:
            if leaf.shape == adjustments.shape:
                out[path] = leaf + adjustments.astype(leaf.dtype)
                count += 1
                continue
            if leaf.ndim == 2 and leaf.shape[-1] == num_experts:
                # scanned-layers layout: one (L, E) stacked bias leaf
                out[path] = leaf + adjustments.astype(leaf.dtype)[None, :]
                count += leaf.shape[0]
                continue
        out[path] = leaf
    return traverse_util.unflatten_dict(out), count


def reset_stats_buffer(stats_buffer):
    """Zero every leaf (reference moe_slow_loop.py:441-451)."""
    return jax.tree.map(jnp.zeros_like, stats_buffer)
