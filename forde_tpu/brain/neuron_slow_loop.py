"""Dual-encoder slow loop: per-neuron brain update for StatefulLayer towers.

This realizes the original FORDE brain update the reference README specifies
(README.md:13-20: sense -> cluster -> smooth -> actuate over per-neuron
Gini/GDP statistics) but whose implementation the reference deleted in its
LLM pivot (SURVEY.md §0). Fully jittable and on-device, like the MoE loop.

Per StatefulLayer:
  1. SENSE   — average the accumulated [act_gini, act_gdp, act_var] sums
               (from the ``stats_buffer`` collection) and the
               [grad_gini, grad_gdp] sums (harvested by the train step from
               the gradient taps) into a per-neuron (F, 5) stat matrix
               ordered [grad_gini, grad_gdp, act_gini, act_gdp, act_var]
               (reference sensing.py:66-67 ordering).
  2. CLUSTER — on-device GMM into num_clusters neuron types, THEN
               canonicalize labels by ascending mean grad_gini so that
               0 = Generalist (relu), 1 = Pooling (tanh), 2 = Specialist
               (binary_step). GMM labels are arbitrary; the canonical
               ordering makes them actuate deterministically.
               Forde-lite mode replaces the GMM with the rule-based
               assigner (README.md:58-59).
  3. SMOOTH  — mode-filter over a near-square 2D neuron grid.
  4. ACTUATE — write the new assignments into the ``brain`` collection.
  5. RESET   — zero both stat accumulators.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze

from forde_tpu.brain.clustering import cluster_neurons_gmm
from forde_tpu.brain.smoothing import near_square_grid, smooth_assignments
from forde_tpu.core.config import BrainConfig


def forde_lite_assignments(
    stats: jnp.ndarray, brain: BrainConfig
) -> jnp.ndarray:
    """Rule-based ablation (README.md:58-59): instantaneous thresholds
    instead of GMM over history. stats (F, 5)."""
    grad_gini = stats[:, 0]
    act_gini = stats[:, 2]
    is_spec = grad_gini > brain.lite_spec_grad_gini
    is_pool = (~is_spec) & (act_gini < brain.lite_pool_act_gini)
    return jnp.where(is_spec, 2, jnp.where(is_pool, 1, 0)).astype(jnp.int32)


def canonicalize_labels(
    assignments: jnp.ndarray, grad_gini: jnp.ndarray, num_clusters: int
) -> jnp.ndarray:
    """Relabel clusters by ascending member-mean grad_gini: the cluster of
    most-uniformly-used-gradient neurons becomes Generalist (0), the most
    gradient-sparse becomes Specialist (last)."""
    resp = jax.nn.one_hot(assignments, num_clusters, dtype=jnp.float32)
    counts = resp.sum(axis=0)
    means = (resp * grad_gini[:, None]).sum(axis=0) / jnp.maximum(counts, 1.0)
    # Empty clusters sort last so real clusters keep the low labels.
    means = jnp.where(counts > 0, means, jnp.inf)
    order = jnp.argsort(means)  # order[i] = old label with i-th smallest gini
    mapping = jnp.zeros((num_clusters,), jnp.int32)
    mapping = mapping.at[order].set(jnp.arange(num_clusters, dtype=jnp.int32))
    return mapping[assignments]


def layer_update(
    stats5: jnp.ndarray,
    key: jax.Array,
    brain: BrainConfig,
    forde_lite: bool,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Cluster + canonicalize + smooth one layer's (F, 5) stats into (F,)
    assignments."""
    f = stats5.shape[0]
    if forde_lite:
        assignments = forde_lite_assignments(stats5, brain)
        gmm_info = {}
    else:
        raw, gmm_params = cluster_neurons_gmm(
            stats5,
            brain.num_clusters,
            key,
            num_iters=brain.gmm_iterations,
            kmeans_iters=brain.gmm_kmeans_iterations,
        )
        assignments = canonicalize_labels(raw, stats5[:, 0], brain.num_clusters)
        gmm_info = {"gmm_weights": gmm_params["weights"]}

    gh, gw = near_square_grid(f)
    smoothed = smooth_assignments(
        assignments.reshape(gh, gw),
        kernel_size=brain.smoothing_kernel_size,
        num_clusters=brain.num_clusters,
    ).reshape(-1).astype(jnp.int32)
    changes = jnp.sum(smoothed != assignments)
    return smoothed, {"smoothing_changes": changes, **gmm_info}


def _tap_to_layer(path: Tuple) -> Tuple:
    """Map a perturbations/z_tap path to its StatefulLayer scope path."""
    return tuple(p for p in path if p != "z_tap")


@functools.partial(jax.jit, static_argnames=("brain", "forde_lite"))
def neuron_slow_loop_step(
    brain_vars: Dict,
    stats_buffer: Dict,
    grad_stats: Dict,
    grad_step_count: jnp.ndarray,
    key: jax.Array,
    brain: BrainConfig = BrainConfig(),
    forde_lite: bool = False,
) -> Tuple[Dict, Dict, Dict, Dict[str, Any]]:
    """One brain update over every StatefulLayer.

    Args:
        brain_vars: the ``brain`` collection ({...: neuron_assignments}).
        stats_buffer: the ``stats_buffer`` collection (act_stats sums +
            step_count per layer).
        grad_stats: pytree matching the gradient taps, each leaf (F, 2)
            sums of [grad_gini, grad_gdp] per step (train-step harvested).
        grad_step_count: scalar number of accumulated grad-stat steps.
        key: PRNG key (split per layer).

    Returns (new_brain_vars, zeroed_stats_buffer, zeroed_grad_stats,
    diagnostics).
    """
    flat_brain = traverse_util.flatten_dict(unfreeze(brain_vars))
    flat_stats = traverse_util.flatten_dict(unfreeze(stats_buffer))
    flat_grads = {
        _tap_to_layer(p): v
        for p, v in traverse_util.flatten_dict(unfreeze(grad_stats)).items()
    }

    layer_paths = sorted(
        [p[:-1] for p in flat_brain if p[-1] == "neuron_assignments"]
    )
    keys = jax.random.split(key, max(len(layer_paths), 1))
    diagnostics: Dict[str, Any] = {"layers": {}}
    new_brain = dict(flat_brain)

    any_active = jnp.array(False)
    for i, lp in enumerate(layer_paths):
        act_sums = flat_stats.get(lp + ("act_stats",))
        steps = flat_stats.get(lp + ("step_count",), jnp.array(0, jnp.int32))
        grad_sums = flat_grads.get(lp)
        f = flat_brain[lp + ("neuron_assignments",)].shape[0]

        act_mean = (
            act_sums / jnp.maximum(steps, 1).astype(jnp.float32)
            if act_sums is not None
            else jnp.zeros((f, 3), jnp.float32)
        )
        grad_mean = (
            grad_sums / jnp.maximum(grad_step_count, 1).astype(jnp.float32)
            if grad_sums is not None
            else jnp.zeros((f, 2), jnp.float32)
        )
        stats5 = jnp.concatenate([grad_mean, act_mean], axis=-1)  # (F, 5)

        new_assign, info = layer_update(stats5, keys[i], brain, forde_lite)
        active = steps > 0
        any_active = any_active | active
        old = flat_brain[lp + ("neuron_assignments",)]
        new_brain[lp + ("neuron_assignments",)] = jnp.where(
            active, new_assign, old
        )
        diagnostics["layers"]["/".join(map(str, lp))] = {
            "assignments": new_brain[lp + ("neuron_assignments",)],
            "stats": stats5,
            **info,
        }

    diagnostics["skipped"] = ~any_active
    new_stats = jax.tree.map(jnp.zeros_like, stats_buffer)
    new_grads = jax.tree.map(jnp.zeros_like, grad_stats)
    return (
        traverse_util.unflatten_dict(new_brain),
        new_stats,
        new_grads,
        diagnostics,
    )
