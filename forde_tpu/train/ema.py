"""Exponential moving average of model parameters.

A serving/eval-quality capability the reference lacks (its training loop
keeps only the live optimizer params, src/training/train.py:412-422).
CLIP-style contrastive models in particular evaluate noticeably better
from an EMA of the weights than from the raw trajectory.

TPU-first: the EMA update is folded into the SAME jitted program as the
optimizer step (``with_ema`` wraps any ``(state, batch) -> (state,
metrics)`` step function), so it costs one fused multiply-add pass over
the param bytes per step — no extra dispatch, no host sync. The EMA tree
lives on the train state (``ema_params``) and therefore checkpoints,
restores, and shards (FSDP/TP/EP rules are path-based and see the same
param names) exactly like the live params.

Note: the FORDE slow loop's router-bias actuation edits the live params
OUTSIDE the step function (train/loop.py); the EMA tracks the fast-loop
trajectory and picks those edits up through subsequent updates, the
standard EMA-under-interventions behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def init_ema(state):
    """Seed the EMA with a copy of the current params (call once, after
    create_*_train_state / restore)."""
    if getattr(state, "ema_params", None) is not None:
        return state  # restored checkpoint already carries an EMA
    # a REAL copy: aliasing the param buffers would make the donated step
    # hand the same buffer to XLA twice
    return state.replace(ema_params=jax.tree.map(jnp.copy, state.params))


def with_ema(step_fn, decay: float):
    """Wrap a train step so each optimizer step also advances
    ``ema_params <- decay * ema_params + (1 - decay) * params`` in the
    same compiled program."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch):
        new_state, metrics = step_fn(state, batch)
        ema = jax.tree.map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
            state.ema_params,
            new_state.params,
        )
        return new_state.replace(ema_params=ema), metrics

    return step


def swap_in_ema(state):
    """Return a state whose live params ARE the EMA weights (for eval or
    serving); the optimizer state is untouched — don't train on it."""
    assert getattr(state, "ema_params", None) is not None, "EMA not enabled"
    return state.replace(params=state.ema_params)
