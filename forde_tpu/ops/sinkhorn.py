"""Sinkhorn-Knopp projection onto the doubly-stochastic manifold.

Behavioral parity with the reference (src/forde/hyper_connections.py:24-80):
two variants, one seeded with softplus(logits) and one with
exp(logits / temperature); both then alternate row/column normalization for
a fixed number of iterations with an epsilon in every denominator.

TPU notes: the (S, S) matrices here are tiny (num_streams <= 8), so this is
VPU work that XLA fuses into the surrounding graph; the iteration count is
static so the loop unrolls at trace time exactly like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize_iters(m: jnp.ndarray, num_iterations: int, epsilon: float):
    def body(_, m):
        m = m / (jnp.sum(m, axis=1, keepdims=True) + epsilon)
        m = m / (jnp.sum(m, axis=0, keepdims=True) + epsilon)
        return m

    return jax.lax.fori_loop(0, num_iterations, body, m)


def sinkhorn_knopp(
    logits: jnp.ndarray, num_iterations: int = 5, epsilon: float = 1e-8
) -> jnp.ndarray:
    """Softplus-seeded variant (reference hyper_connections.py:24-51)."""
    m = jax.nn.softplus(logits.astype(jnp.float32)) + epsilon
    return _normalize_iters(m, num_iterations, epsilon).astype(logits.dtype)


def sinkhorn_knopp_exp(
    logits: jnp.ndarray,
    num_iterations: int = 5,
    temperature: float = 1.0,
    epsilon: float = 1e-8,
) -> jnp.ndarray:
    """Exp/temperature-seeded variant — the one the model actually uses
    (reference hyper_connections.py:54-80, used at :174)."""
    m = jnp.exp(logits.astype(jnp.float32) / temperature) + epsilon
    return _normalize_iters(m, num_iterations, epsilon).astype(logits.dtype)


def verify_doubly_stochastic(matrix: jnp.ndarray, tolerance: float = 1e-4) -> bool:
    """Check row and column sums are 1 (reference hyper_connections.py:297-305)."""
    rows_ok = jnp.allclose(matrix.sum(axis=1), 1.0, atol=tolerance)
    cols_ok = jnp.allclose(matrix.sum(axis=0), 1.0, atol=tolerance)
    return bool(rows_ok and cols_ok)
