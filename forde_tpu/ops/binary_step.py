"""Straight-through binary step activation.

The StatefulLayer's specialist path (reference README.md:47-56): forward is
a hard threshold, backward passes the gradient straight through so the
discontinuity is trainable. This is a first-class op so both the jnp
StatefulLayer and the fused Pallas kernel share one gradient definition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def binary_step(x: jnp.ndarray) -> jnp.ndarray:
    """Hard threshold: 1.0 where x > 0 else 0.0, straight-through gradient."""
    return (x > 0).astype(x.dtype)


def _binary_step_fwd(x):
    return binary_step(x), None


def _binary_step_bwd(_, g):
    return (g,)


binary_step.defvjp(_binary_step_fwd, _binary_step_bwd)
