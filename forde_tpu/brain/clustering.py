"""Clustering: on-device GMM over neuron/expert statistics.

Parity target: reference src/forde/clustering.py (cluster_neurons_gmm
:6-39) and src/forde/moe_slow_loop.py (cluster_experts :175-208) — same
signatures and return contract, but the sklearn host round-trip
(clustering.py:21-30, the one component that blocked jitting the
reference's slow loop) is replaced by the jittable EM in
``forde_tpu.ops.gmm``. Assignments never leave the device.

Cluster labels are arbitrary up to permutation, exactly as with sklearn
(different seeds permute labels); fidelity comparisons must be
permutation-tolerant (SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from forde_tpu.ops.gmm import fit_gmm


def cluster_neurons_gmm(
    aggregated_stats: jnp.ndarray,
    num_clusters: int,
    random_key: jax.Array,
    num_iters: int = 50,
    kmeans_iters: int = 10,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Cluster (N, D) stats into ``num_clusters`` neuron types on device.

    Returns (int32 assignments (N,), {weights, means, covariances}) — the
    reference contract (clustering.py:16-19).
    """
    return fit_gmm(
        aggregated_stats.astype(jnp.float32),
        num_clusters,
        random_key,
        num_iters=num_iters,
        kmeans_iters=kmeans_iters,
    )


def cluster_experts(
    expert_stats: jnp.ndarray,
    num_clusters: int = 3,
    random_key: jax.Array = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Cluster experts by usage statistics; accepts (E, D) or (L, E, D)
    (reference moe_slow_loop.py:175-208). Cluster roles by convention:
    0 generalist, 1 specialist, 2 under-utilized."""
    if random_key is None:
        random_key = jax.random.PRNGKey(0)
    original_shape = expert_stats.shape
    flat = expert_stats.reshape(-1, original_shape[-1])
    assignments, params = cluster_neurons_gmm(flat, num_clusters, random_key)
    return assignments.reshape(original_shape[:-1]), params
