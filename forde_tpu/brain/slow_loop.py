"""The MoE slow loop ("brain update"): Sense -> Cluster -> Smooth ->
Analyze -> Actuate -> Reset.

Parity target: reference src/forde/moe_slow_loop.py:253-464, with the same
pipeline, signature shape, and diagnostics dict. The decisive difference:
the reference runs host-side (sklearn GMM forces device->host->device,
clustering.py:27-30); here the ENTIRE step is one jitted device
computation — params, stats, assignments, and adjustments never leave HBM.
The north-star budget is <100 ms on-chip (BASELINE.json).

Because the whole step is traced, the reference's early-return on
``step_count == 0`` (moe_slow_loop.py:293-295) becomes a mask: adjustments
are scaled to zero and the diagnostics carry ``skipped`` as a traced bool.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze

from forde_tpu.brain.actuation import (
    apply_router_adjustments,
    compute_router_adjustments,
    reset_stats_buffer,
)
from forde_tpu.brain.clustering import cluster_experts
from forde_tpu.brain.smoothing import near_square_grid, smooth_assignments_3d
from forde_tpu.core.config import BrainConfig

_LAYER_RE = re.compile(r"layer[_s]*(\d+)")

# NOTE: the reference's MoESlowLoopState class (moe_slow_loop.py:91-119) is
# dead code there and is deliberately NOT reproduced here — the live
# fast<->slow-loop contract is the ``stats_buffer`` variable collection.


def collect_moe_stats(
    mutable_variables: Dict, num_layers: int, num_experts: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-layer expert_usage from the stats_buffer collection.

    Walks the (static) pytree structure for leaves named ``expert_usage``
    and parses the layer index out of the path (reference
    collect_moe_stats_from_variables, moe_slow_loop.py:122-172). Returns
    ((L, E) usage sums, scalar step_count) — both traced values; the walk
    itself is trace-time Python over static structure, so this is jittable.
    """
    stats_buffer = mutable_variables.get("stats_buffer", {})
    flat = traverse_util.flatten_dict(unfreeze(stats_buffer))

    usage = jnp.zeros((num_layers, num_experts), dtype=jnp.float32)
    step_count = jnp.array(0, dtype=jnp.int32)
    for path, leaf in flat.items():
        name = path[-1]
        joined = "/".join(str(p) for p in path)
        if name == "expert_usage" and leaf.shape == (num_experts,):
            m = _LAYER_RE.search(joined)
            layer_idx = int(m.group(1)) if m else 0
            usage = usage.at[layer_idx].set(leaf.astype(jnp.float32))
        elif name == "expert_usage" and leaf.shape == (num_layers, num_experts):
            # scanned-layers layout: the whole (L, E) stack in one leaf
            usage = leaf.astype(jnp.float32)
        elif name == "step_count":
            step_count = jnp.maximum(
                step_count, jnp.max(leaf).astype(jnp.int32)
            )
    return usage, step_count


def _slow_loop_core(
    params,
    mutable_variables,
    key,
    *,
    num_layers: int,
    num_experts: int,
    brain: BrainConfig,
):
    # ---- 1. SENSE ----
    usage_sum, step_count = collect_moe_stats(
        mutable_variables, num_layers, num_experts
    )
    active = step_count > 0
    denom = jnp.maximum(step_count, 1).astype(jnp.float32)
    expert_usage = usage_sum / denom  # (L, E) mean router prob per expert

    # ---- 2. CLUSTER ----
    usage_mean = expert_usage.mean(axis=0)  # (E,)
    usage_var = expert_usage.var(axis=0)
    cluster_features = jnp.stack([usage_mean, usage_var], axis=-1)
    key, cluster_key = jax.random.split(key)
    assignments, gmm_params = cluster_experts(
        cluster_features, num_clusters=brain.num_clusters, random_key=cluster_key
    )

    # ---- 3. SMOOTH ----
    gh, gw = near_square_grid(num_experts)
    grid = assignments.reshape(1, gh, gw)
    smoothed = smooth_assignments_3d(
        grid,
        kernel_size=brain.smoothing_kernel_size,
        num_clusters=brain.num_clusters,
    )
    smoothed_assignments = smoothed.reshape(-1).astype(jnp.int32)
    smoothing_changes = jnp.sum(assignments != smoothed_assignments)
    assignments = smoothed_assignments

    # ---- 4. ANALYZE ----
    eps = 1e-8
    load_imbalance = jnp.abs(usage_mean - 1.0 / num_experts).mean()
    routing_entropy = -(usage_mean * jnp.log(usage_mean + eps)).sum()
    relative_entropy = routing_entropy / jnp.log(float(num_experts))

    # ---- 5. ACTUATE ----
    adjustments = compute_router_adjustments(
        assignments,
        usage_mean,
        target_balance=brain.target_balance,
        max_adjustment=brain.max_adjustment,
        specialist_damping=brain.specialist_damping,
    )
    # Mask instead of early-return: no accumulated stats -> no-op update.
    adjustments = adjustments * active.astype(adjustments.dtype)
    new_params, updates_count = apply_router_adjustments(params, adjustments)

    # ---- 6. RESET ----
    new_mutable = dict(unfreeze(mutable_variables))
    if "stats_buffer" in new_mutable:
        new_mutable["stats_buffer"] = reset_stats_buffer(
            new_mutable["stats_buffer"]
        )

    diagnostics = {
        "skipped": ~active,
        "expert_usage": usage_mean,
        "assignments": assignments,
        "load_imbalance": load_imbalance,
        "routing_entropy": relative_entropy,
        "adjustments": adjustments,
        "step_count": step_count,
        "smoothing_changes": smoothing_changes,
        "gmm_weights": gmm_params["weights"],
        "updates_count": jnp.array(updates_count),
        "cluster_features": cluster_features,
    }
    return new_params, new_mutable, diagnostics


@functools.partial(
    jax.jit, static_argnames=("num_layers", "num_experts", "brain")
)
def _slow_loop_jit(params, mutable_variables, key, num_layers, num_experts, brain):
    return _slow_loop_core(
        params,
        mutable_variables,
        key,
        num_layers=num_layers,
        num_experts=num_experts,
        brain=brain,
    )


def moe_slow_loop_step(
    model_params: Dict,
    mutable_variables: Dict,
    config: Any,
    key: jax.Array,
    epoch: int = 0,
    step: int = 0,
    brain: BrainConfig = BrainConfig(),
    verbose: bool = False,
) -> Tuple[Dict, Dict, Dict]:
    """One brain update. Same calling shape as the reference
    (moe_slow_loop.py:253-260): returns (updated_params,
    updated_mutable_vars, diagnostics). One fused on-device computation.
    """
    new_params, new_mutable, diagnostics = _slow_loop_jit(
        model_params,
        mutable_variables,
        key,
        config.num_layers,
        config.num_experts,
        brain,
    )
    if verbose:
        # ONE bulk transfer: per-field host reads cost a full tunnel round
        # trip each (~20 ms apiece through axon) and were the difference
        # between a 40 ms and a 260 ms driver-visible brain update.
        diagnostics = jax.device_get(diagnostics)
        _print_report(diagnostics, epoch, step)
    return new_params, new_mutable, diagnostics


def _print_report(diag: Dict, epoch: int, step: int) -> None:
    """Console report in the spirit of the reference's structured prints
    (moe_slow_loop.py:281-452) — but off the hot path and opt-in."""
    print(f"\n{'=' * 50}")
    print(f"MoE Slow Loop - Epoch {epoch}, Step {step}")
    print(f"{'=' * 50}")
    if bool(diag["skipped"]):
        print("No stats accumulated yet; update was a no-op.")
        return
    print(f"Steps accumulated: {int(diag['step_count'])}")
    print(f"Expert usage: {diag['expert_usage']}")
    roles = {0: "Generalist", 1: "Specialist", 2: "Under-utilized"}
    assignments = jax.device_get(diag["assignments"])
    for c in sorted(set(int(a) for a in assignments)):
        count = int((assignments == c).sum())
        print(f"Cluster {c} ({roles.get(c, 'Unknown')}): {count} experts")
    print(f"Smoothing changed {int(diag['smoothing_changes'])} assignments")
    print(f"Mean load imbalance: {float(diag['load_imbalance']):.4f}")
    print(f"Routing entropy (relative): {float(diag['routing_entropy']):.4f}")
    print(f"Router adjustments: {diag['adjustments']}")
    print(f"Applied updates to {int(diag['updates_count'])} router biases")
    print(f"{'=' * 50}\n")
