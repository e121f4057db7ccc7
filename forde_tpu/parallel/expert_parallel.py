"""Explicit expert parallelism: shard_map MoE over the ``expert`` mesh axis.

The default MoE path relies on pjit sharding propagation over the stacked
expert tensors; this module states the parallelism explicitly (SURVEY.md
§2.4: EP as a first-class component). Every device holds E/ep experts.
Two dispatch variants, auto-selected by ``expert_parallel_ffn``:

  * **all-to-all** (GShard-style, the production path): each expert-axis
    device routes a distinct 1/ep slice of the local tokens into per-
    expert capacity buffers, one ``all_to_all`` moves each buffer to the
    device owning that expert, the expert FFN runs on (E/ep, ep*C, D),
    and a second ``all_to_all`` returns outputs to the token owners.
    Per-device comms scale as 2 * top_k * capacity_factor * D per token
    — independent of the expert-axis width.
  * **psum fallback**: activations replicated over the ``expert`` axis,
    each shard computes its experts' slice of a globally-routed capacity
    plan, partial (T, D) outputs summed with ``psum``. Used when the
    local token count does not divide the expert axis (the all-to-all
    slice would be ragged); fine for narrow expert meshes.

The auxiliary load-balance loss is assembled from pmean'd fractions and
probabilities over the ``data`` axis, which reproduces the global-batch
formula exactly for equal shard sizes.

Capacity semantics: the all-to-all variant budgets ``capacity`` per
SOURCE shard (total expert slots = ep * C, the same global budget as the
psum variant), so overflow drops are decided per (source shard, expert)
pair rather than globally — the standard GShard behavior. With
``capacity_factor >= num_experts`` no token ever drops and both variants
are exact.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_CONTEXT, AXIS_DATA, AXIS_EXPERT
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


def _ep_a2a_ffn_body(
    flat_x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down,
    *, num_experts: int, top_k: int, capacity: int, expert_axis: str,
):
    """GShard-style all-to-all EP FFN.

    Each expert-axis device owns a distinct T/ep slice of the local
    tokens. Dispatch buffers (E, C, D) are built shard-locally, an
    ``all_to_all`` delivers each expert's buffers to its owner, the
    local expert shard computes (E/ep, ep*C, D), and a reverse
    ``all_to_all`` returns outputs for the local combine. Returns the
    (T/ep, D) outputs of THIS device's token slice (reassembled by the
    caller's out_specs).
    """
    e_shard = w_up.shape[0]
    ep = num_experts // e_shard
    me = jax.lax.axis_index(expert_axis)
    t, d = flat_x.shape
    t_d = t // ep

    x_me = jax.lax.dynamic_slice(flat_x, (me * t_d, 0), (t_d, d))
    idx_me = jax.lax.dynamic_slice(
        top_k_indices, (me * t_d, 0), (t_d, top_k)
    )
    prob_me = jax.lax.dynamic_slice(
        top_k_probs, (me * t_d, 0), (t_d, top_k)
    )

    plan = moe_dispatch.capacity_route(idx_me, prob_me, num_experts, capacity)
    send = moe_dispatch.capacity_gather(x_me, plan)  # (E, C, D)
    send = send.reshape(ep, e_shard, capacity, d)
    # recv[src, le, c] = slot c of MY local expert le, from source shard src
    recv = jax.lax.all_to_all(send, expert_axis, 0, 0)

    h_in = recv.transpose(1, 0, 2, 3).reshape(e_shard, ep * capacity, d)
    h = jnp.einsum("ecd,edh->ech", h_in, w_up.astype(h_in.dtype))
    h = jax.nn.gelu(h + b_up.astype(h.dtype)[:, None, :])
    out = (
        jnp.einsum("ech,ehd->ecd", h, w_down.astype(h.dtype))
        + b_down.astype(h.dtype)[:, None, :]
    )

    out = out.reshape(e_shard, ep, capacity, d).transpose(1, 0, 2, 3)
    # back[src_e, le, c] = global expert (src_e*e_shard + le)'s output for
    # MY slot c — exactly the (E, C, D) table the local plan indexes.
    back = jax.lax.all_to_all(out, expert_axis, 0, 0)
    return moe_dispatch.capacity_combine(
        back.reshape(num_experts, capacity, d), plan
    )


def _ep_a2a_logits_body(
    x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down,
    *, num_experts: int, top_k: int, capacity: int, expert_axis: str,
):
    """All-to-all EP body for the model path (routing made outside)."""
    b, s, d = x.shape
    return _ep_a2a_ffn_body(
        x.reshape(b * s, d),
        top_k_indices.reshape(b * s, top_k),
        top_k_probs.reshape(b * s, top_k),
        w_up, b_up, w_down, b_down,
        num_experts=num_experts, top_k=top_k, capacity=capacity,
        expert_axis=expert_axis,
    )


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
    variant: str = "auto",
) -> jnp.ndarray:
    """The MoE FFN with explicit EP, for use INSIDE the model (pjit trace).

    The router (and the aux loss) run in the surrounding pjit computation;
    only the expert dispatch/compute/combine is shard_mapped. This is the
    production EP path behind ``LLMConfig.moe_dispatch == "ep"``
    (nn/moe.py); ``expert_parallel_moe`` above is the standalone
    (router-included) variant.

    ``variant``: "a2a" | "psum" | "auto" (all-to-all whenever the local
    token count divides the expert axis — see module docstring).

    Args:
        x: (B, S, D) activations, batch sharded over ``data``.
        top_k_indices / top_k_probs: (B, S, K) routing decisions.
        expert_params: (w_up (E,D,H), b_up (E,H), w_down (E,H,D),
            b_down (E,D)), sharded on dim 0 over ``expert``.
    """
    b, s, _ = x.shape
    data_shards = mesh.shape[AXIS_DATA]
    ep = mesh.shape[AXIS_EXPERT]
    cp = mesh.shape.get(AXIS_CONTEXT, 1)
    # Context parallelism composes: tokens arrive sharded (data, context)
    # on (B, S); the FFN is per-token, so the context axis just further
    # divides the local token count. The a2a variant's flat out_specs
    # cannot express a context-split S dim, so CP meshes take the psum
    # variant (activations replicated over ``expert`` only).
    ctx = AXIS_CONTEXT if cp > 1 else None
    t_local = (b // data_shards) * (s // cp)
    w_up, b_up, w_down, b_down = expert_params

    if variant == "auto":
        variant = "a2a" if t_local % ep == 0 and cp == 1 else "psum"
    if variant == "a2a":
        if cp > 1:
            raise ValueError(
                "all-to-all EP does not compose with context parallelism "
                "(flat token out_specs cannot split S over 'context'); "
                "use variant='psum'"
            )
        if t_local % ep:
            raise ValueError(
                f"all-to-all EP needs local tokens {t_local} divisible by "
                f"the expert axis ({ep}); use variant='psum'"
            )
        t_d = t_local // ep
        capacity = max(
            int(capacity_factor * t_d * top_k / num_experts), top_k
        )
        fn = jax.shard_map(
            functools.partial(
                _ep_a2a_logits_body,
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
            # (T/ep, D) per device, stacked (data-major, expert-minor) —
            # exactly the flattened (B_local*S) token order per data shard.
            out_specs=P((AXIS_DATA, AXIS_EXPERT), None),
        )
        out = fn(x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down)
        return out.reshape(b, s, -1).astype(x.dtype)

    capacity = max(int(capacity_factor * t_local * top_k / num_experts), top_k)
    tok_spec = P(AXIS_DATA, ctx, None)
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
            tok_spec,
            tok_spec,
            tok_spec,
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
            P(AXIS_EXPERT, None, None), P(AXIS_EXPERT, None),
        ),
        out_specs=tok_spec,
    )
    return fn(x, top_k_indices, top_k_probs, w_up, b_up, w_down, b_down)
