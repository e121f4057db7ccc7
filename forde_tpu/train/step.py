"""The jitted fast-loop train step.

Parity target: reference train_step (src/training/train.py:122-171): apply
with mutable ``stats_buffer``, shifted next-token cross-entropy, total =
lm + aux_weight * aux, value_and_grad, apply_gradients, thread the new
stats buffer back, report grad-norm.

TPU-first details:
  * one fused XLA computation; the state is donated so params/opt-state
    update in place in HBM;
  * loss/softmax in fp32 even under bf16 compute;
  * works unchanged under a multi-device mesh — batch sharded on ``data``,
    expert params on ``expert`` — because everything is expressed through
    jit + shardings, not per-device code.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from forde_tpu.train.state import TrainState


def loss_fn(params, state: TrainState, batch: Dict, aux_loss_weight: float):
    input_ids = batch["input_ids"]
    (logits, aux_loss), updates = state.apply_fn(
        {"params": params, "stats_buffer": state.stats_buffer},
        input_ids,
        mutable=["stats_buffer"],
    )
    shift_logits = logits[:, :-1, :]
    shift_labels = input_ids[:, 1:]
    lm_loss = optax.softmax_cross_entropy_with_integer_labels(
        shift_logits.astype(jnp.float32), shift_labels
    ).mean()
    total = lm_loss + aux_loss_weight * aux_loss
    return total, (lm_loss, aux_loss, updates["stats_buffer"])


@functools.partial(jax.jit, static_argnames=("aux_loss_weight",), donate_argnums=(0,))
def train_step(
    state: TrainState, batch: Dict, aux_loss_weight: float = 1.0
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimizer step. Returns (new_state, metrics).

    Note: unlike the reference docstring's claim (train.py:124-128),
    aux_loss_weight here really is static — changing it recompiles.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (total_loss, (lm_loss, aux_loss, new_stats)), grads = grad_fn(
        state.params, state, batch, aux_loss_weight
    )
    new_state = state.apply_gradients(grads=grads)
    new_state = new_state.replace(stats_buffer=new_stats)
    grad_norm = optax.global_norm(grads)
    metrics = {
        "loss/total": total_loss,
        "loss/lm": lm_loss,
        "loss/aux": aux_loss,
        "training/grad_norm": grad_norm,
    }
    return new_state, metrics


@jax.jit
def eval_step(state: TrainState, batch: Dict) -> Dict[str, jnp.ndarray]:
    """Forward-only loss (no stats mutation, no grads)."""
    input_ids = batch["input_ids"]
    (logits, aux_loss), _ = state.apply_fn(
        {"params": state.params, "stats_buffer": state.stats_buffer},
        input_ids,
        mutable=["stats_buffer"],
    )
    lm_loss = optax.softmax_cross_entropy_with_integer_labels(
        logits[:, :-1, :].astype(jnp.float32), input_ids[:, 1:]
    ).mean()
    return {"loss/lm": lm_loss, "loss/aux": aux_loss}
