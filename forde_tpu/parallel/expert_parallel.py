"""Explicit expert parallelism: shard_map MoE over the ``expert`` mesh axis.

The default MoE path relies on pjit sharding propagation over the stacked
expert tensors; this module states the parallelism explicitly (SURVEY.md
§2.4: EP as a first-class component): every device holds E/ep experts,
activations are sharded over ``data`` and replicated over the (small)
``expert`` axis, each expert shard computes its slice of the capacity-
routed dispatch, and partial token outputs are summed with a ``psum`` over
the expert axis (the replicate-activations + reduce-combine EP variant —
the right trade when the expert axis is narrow; ragged all-to-all dispatch
is the follow-up for wide expert meshes).

The auxiliary load-balance loss is assembled from pmean'd fractions and
probabilities over the ``data`` axis, which reproduces the global-batch
formula exactly for equal shard sizes.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_DATA, AXIS_EXPERT
from forde_tpu.ops import moe_dispatch


def _ep_ffn_body(
    flat_x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down,
    *, num_experts: int, top_k: int, capacity: int, expert_axis: str,
):
    """Shared EP FFN: capacity-route local tokens, run the local expert
    shard, psum partial combines over the expert axis. Token tensors are
    (T_local, ...) — already sharded over ``data`` by shard_map."""
    e_shard = w_up.shape[0]  # local experts
    e_idx = jax.lax.axis_index(expert_axis)
    e0 = e_idx * e_shard

    plan = moe_dispatch.capacity_route(
        top_k_indices, top_k_probs, num_experts, capacity
    )

    # Local expert slice of the global slot tables.
    slot_token = jax.lax.dynamic_slice(
        plan["slot_token"], (e0, 0), (e_shard, capacity)
    )
    slot_valid = jax.lax.dynamic_slice(
        plan["slot_valid"], (e0, 0), (e_shard, capacity)
    )
    expert_in = flat_x[slot_token] * slot_valid[..., None].astype(flat_x.dtype)

    h = jnp.einsum("ecd,edh->ech", expert_in, w_up.astype(expert_in.dtype))
    h = jax.nn.gelu(h + b_up.astype(h.dtype)[:, None, :])
    expert_out = (
        jnp.einsum("ech,ehd->ecd", h, w_down.astype(h.dtype))
        + b_down.astype(h.dtype)[:, None, :]
    )

    # Partial combine: only contributions whose expert lives on this shard.
    local = (plan["expert_indices"] >= e0) & (
        plan["expert_indices"] < e0 + e_shard
    )
    local_e = jnp.clip(plan["expert_indices"] - e0, 0, e_shard - 1)
    pos = jnp.minimum(plan["position"], capacity - 1)
    per_slot = expert_out[local_e, pos]  # (T, K, D)
    weight = (plan["weight"] * local).astype(expert_out.dtype)[..., None]
    partial = jnp.sum(per_slot * weight, axis=1)  # (T, D)
    return jax.lax.psum(partial, expert_axis)


def _ep_body(
    x, router_kernel, router_bias, w_up, b_up, w_down, b_down,
    *, num_experts: int, top_k: int, capacity: int, data_axis: str,
    expert_axis: str,
):
    b, s, d = x.shape
    flat_x = x.reshape(b * s, d)
    logits = (
        flat_x.astype(jnp.float32) @ router_kernel.astype(jnp.float32)
        + router_bias.astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1)
    top_k_indices, top_k_probs = moe_dispatch.top_k_gating(logits, top_k)

    output = _ep_ffn_body(
        flat_x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down,
        num_experts=num_experts, top_k=top_k, capacity=capacity,
        expert_axis=expert_axis,
    ).reshape(b, s, d)

    # Global-batch aux loss from pmean'd statistics over the data axis.
    t_local = flat_x.shape[0]
    counts = jnp.bincount(top_k_indices.reshape(-1), length=num_experts)
    frac = jax.lax.pmean(counts / (t_local * top_k), data_axis)
    prob = jax.lax.pmean(probs.mean(axis=0), data_axis)
    aux = num_experts * jnp.sum(frac * prob)
    return output.astype(x.dtype), aux


def _ep_logits_body(
    x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down,
    *, num_experts: int, top_k: int, capacity: int, expert_axis: str,
):
    """EP body for the model path: gating decisions are made by the (pjit)
    router outside and enter pre-sharded over ``data``."""
    b, s, d = x.shape
    flat_x = x.reshape(b * s, d)
    output = _ep_ffn_body(
        flat_x,
        top_k_indices.reshape(b * s, top_k),
        top_k_probs.reshape(b * s, top_k),
        w_up, b_up, w_down, b_down,
        num_experts=num_experts, top_k=top_k, capacity=capacity,
        expert_axis=expert_axis,
    )
    return output.reshape(b, s, d).astype(x.dtype)


def expert_parallel_moe(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    mesh: Mesh,
    *,
    num_experts: int,
    top_k: int = 2,
    capacity_factor: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply a capacity-routed MoE FFN with explicit EP over ``mesh``.

    Args:
        x: (B, S, D), batch sharded over ``data``.
        params: {"router_kernel" (D, E), "router_bias" (E,),
                 "w_up" (E, D, H), "b_up" (E, H),
                 "w_down" (E, H, D), "b_down" (E, D)} — expert-stacked
                 tensors sharded on dim 0 over ``expert``.

    Returns (output (B, S, D) sharded like x, scalar aux loss) — aux has
    the reference's load-balance form over the GLOBAL batch
    (src/forde/moe.py:189-222), before the aux weight.
    """
    b, s, _ = x.shape
    data_shards = mesh.shape[AXIS_DATA]
    t_local = (b // data_shards) * s
    capacity = max(int(capacity_factor * t_local * top_k / num_experts), top_k)

    fn = jax.shard_map(
        functools.partial(
            _ep_body,
            num_experts=num_experts,
            top_k=top_k,
            capacity=capacity,
            data_axis=AXIS_DATA,
            expert_axis=AXIS_EXPERT,
        ),
        mesh=mesh,
        in_specs=(
            P(AXIS_DATA, None, None),
            P(), P(),
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
        ),
        out_specs=(P(AXIS_DATA, None, None), P()),
    )
    return fn(
        x,
        params["router_kernel"], params["router_bias"],
        params["w_up"], params["b_up"], params["w_down"], params["b_down"],
    )


def expert_parallel_ffn(
    x: jnp.ndarray,
    top_k_indices: jnp.ndarray,
    top_k_probs: jnp.ndarray,
    expert_params: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    mesh: Mesh,
    *,
    num_experts: int,
    top_k: int = 2,
    capacity_factor: float = 2.0,
) -> jnp.ndarray:
    """The MoE FFN with explicit EP, for use INSIDE the model (pjit trace).

    The router (and the aux loss) run in the surrounding pjit computation;
    only the expert dispatch/compute/combine is shard_mapped. This is the
    production EP path behind ``LLMConfig.moe_dispatch == "ep"``
    (nn/moe.py); ``expert_parallel_moe`` above is the standalone
    (router-included) variant.

    Args:
        x: (B, S, D) activations, batch sharded over ``data``.
        top_k_indices / top_k_probs: (B, S, K) routing decisions.
        expert_params: (w_up (E,D,H), b_up (E,H), w_down (E,H,D),
            b_down (E,D)), sharded on dim 0 over ``expert``.
    """
    b, s, _ = x.shape
    data_shards = mesh.shape[AXIS_DATA]
    t_local = (b // data_shards) * s
    capacity = max(int(capacity_factor * t_local * top_k / num_experts), top_k)

    w_up, b_up, w_down, b_down = expert_params
    fn = jax.shard_map(
        functools.partial(
            _ep_logits_body,
            num_experts=num_experts,
            top_k=top_k,
            capacity=capacity,
            expert_axis=AXIS_EXPERT,
        ),
        mesh=mesh,
        in_specs=(
            P(AXIS_DATA, None, None),
            P(AXIS_DATA, None, None),
            P(AXIS_DATA, None, None),
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
        ),
        out_specs=P(AXIS_DATA, None, None),
    )
    return fn(x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down)
