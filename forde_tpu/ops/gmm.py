"""On-device Gaussian Mixture Model (jittable EM).

The reference clusters neuron/expert statistics with host-side sklearn
``GaussianMixture`` (src/forde/clustering.py:27-30), forcing a
device->host->device round-trip that blocks jitting the whole slow loop.
This module is the TPU-native replacement: k-means++ initialization, a few
k-means refinement steps (mirroring sklearn's default init strategy), then
full-covariance EM — all fixed-iteration ``lax``-looped and fully jittable,
so cluster assignments never leave the device.

Shapes are tiny (N = neurons-or-experts, D = 2..5 stats, K = 3 clusters);
the value is staying on device inside the jitted slow loop, not FLOPs.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = 1.8378770664093453


def _pairwise_sqdist(x: jnp.ndarray, mu: jnp.ndarray) -> jnp.ndarray:
    """(N, D), (K, D) -> (N, K) squared euclidean distances."""
    return jnp.sum((x[:, None, :] - mu[None, :, :]) ** 2, axis=-1)


def _kmeans_pp_init(x: jnp.ndarray, k: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ seeding: spread initial centers by D^2 sampling."""
    n = x.shape[0]
    keys = jax.random.split(key, k)
    first = jax.random.randint(keys[0], (), 0, n)
    means = jnp.tile(x[first], (k, 1))

    def pick_next(i, means):
        d2 = _pairwise_sqdist(x, means)  # (N, K)
        # Only the first i centers are real; mask the rest out of the min.
        valid = jnp.arange(k)[None, :] < i
        d2 = jnp.where(valid, d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=1)
        probs = min_d2 / (jnp.sum(min_d2) + 1e-12)
        idx = jax.random.choice(keys[i], n, p=probs)
        return means.at[i].set(x[idx])

    return jax.lax.fori_loop(1, k, pick_next, means)


def _kmeans_refine(
    x: jnp.ndarray, means: jnp.ndarray, iters: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k = means.shape[0]

    def step(_, means):
        assign = jnp.argmin(_pairwise_sqdist(x, means), axis=1)
        resp = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (N, K)
        counts = resp.sum(axis=0)  # (K,)
        sums = resp.T @ x  # (K, D)
        new_means = sums / jnp.maximum(counts, 1.0)[:, None]
        # Keep empty clusters where they were.
        return jnp.where(counts[:, None] > 0, new_means, means)

    means = jax.lax.fori_loop(0, iters, step, means)
    assign = jnp.argmin(_pairwise_sqdist(x, means), axis=1)
    return means, assign


def _gaussian_log_prob(
    x: jnp.ndarray, means: jnp.ndarray, covs: jnp.ndarray
) -> jnp.ndarray:
    """Log N(x | mu_k, Sigma_k) for all k. x (N,D) -> (N,K)."""

    def per_component(mu, cov):
        chol = jnp.linalg.cholesky(cov)
        diff = x - mu[None, :]  # (N, D)
        sol = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)  # (D, N)
        maha = jnp.sum(sol**2, axis=0)  # (N,)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        d = x.shape[-1]
        return -0.5 * (d * _LOG_2PI + logdet + maha)

    return jax.vmap(per_component, in_axes=(0, 0), out_axes=1)(means, covs)


@functools.partial(
    jax.jit, static_argnames=("num_clusters", "num_iters", "kmeans_iters")
)
def fit_gmm(
    x: jnp.ndarray,
    num_clusters: int,
    key: jax.Array,
    num_iters: int = 50,
    kmeans_iters: int = 10,
    reg_covar: float = 1e-6,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fit a full-covariance GMM to (N, D) data entirely on device.

    Returns (assignments int32 (N,), params {weights, means, covariances}),
    the same contract as the reference ``cluster_neurons_gmm``
    (src/forde/clustering.py:6-39). Cluster labels are arbitrary (as with
    sklearn); downstream consumers must be label-permutation tolerant.
    """
    x = x.astype(jnp.float32)
    n, d = x.shape
    k = num_clusters
    eye = jnp.eye(d, dtype=jnp.float32)

    # --- init: k-means++ then a few k-means steps ---
    means = _kmeans_pp_init(x, k, key)
    means, assign = _kmeans_refine(x, means, kmeans_iters)
    resp = jax.nn.one_hot(assign, k, dtype=jnp.float32)

    def m_step(resp):
        nk = resp.sum(axis=0) + 1e-10  # (K,)
        weights = nk / n
        means = (resp.T @ x) / nk[:, None]  # (K, D)
        diff = x[:, None, :] - means[None, :, :]  # (N, K, D)
        covs = (
            jnp.einsum("nk,nkd,nke->kde", resp, diff, diff) / nk[:, None, None]
            + reg_covar * eye[None]
        )
        return weights, means, covs

    weights, means, covs = m_step(resp)

    def em_step(_, state):
        weights, means, covs = state
        log_prob = _gaussian_log_prob(x, means, covs)  # (N, K)
        log_resp = jax.nn.log_softmax(
            log_prob + jnp.log(weights + 1e-12)[None, :], axis=1
        )
        resp = jnp.exp(log_resp)
        return m_step(resp)

    weights, means, covs = jax.lax.fori_loop(
        0, num_iters, em_step, (weights, means, covs)
    )

    log_prob = _gaussian_log_prob(x, means, covs)
    posterior = log_prob + jnp.log(weights + 1e-12)[None, :]
    assignments = jnp.argmax(posterior, axis=1).astype(jnp.int32)
    params = {"weights": weights, "means": means, "covariances": covs}
    return assignments, params
