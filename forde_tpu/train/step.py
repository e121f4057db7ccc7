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

import flax.core
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


def make_accum_train_step(accum_steps: int, aux_loss_weight: float = 1.0):
    """Gradient accumulation: one optimizer step from ``accum_steps``
    sequential microbatch forward/backwards (a capability the reference
    lacks — its effective batch is capped by what fits in one apply,
    src/training/train.py:122-171).

    The (B, S) batch is split on axis 0 into ``accum_steps`` equal
    microbatches and scanned; gradients and the LM loss average EXACTLY
    as the full batch would (equal-size microbatch means of per-token
    means). Two documented deviations from a single big-batch step, both
    standard accumulation/GPipe trades:

      * the MoE load-balance aux loss is per-microbatch-averaged
        (nonlinear in batch composition);
      * the stats_buffer sees ``accum_steps`` applies per optimizer step
        — consistent for the slow loop, which normalizes ``expert_usage``
        by ``step_count`` (both advance together; brain/slow_loop.py).

    Peak activation memory is one microbatch's, so effective batch scales
    ~accum_steps-fold at fixed HBM. Composes with the mesh paths (the
    scan body is ordinary jit-traceable code; GSPMD shards each
    microbatch over 'data' as usual).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum_train_step(
        state: TrainState, batch: Dict
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        b = batch["input_ids"].shape[0]
        assert b % accum_steps == 0, (
            f"batch {b} not divisible by grad_accum {accum_steps}"
        )
        micro = jax.tree.map(
            lambda x: x.reshape(accum_steps, b // accum_steps, *x.shape[1:]),
            batch,
        )

        def micro_loss(params, stats, mb):
            (logits, aux_loss), updates = state.apply_fn(
                {"params": params, "stats_buffer": stats},
                mb["input_ids"],
                mutable=["stats_buffer"],
            )
            lm_loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1, :].astype(jnp.float32), mb["input_ids"][:, 1:]
            ).mean()
            total = lm_loss + aux_loss_weight * aux_loss
            return total, (lm_loss, aux_loss, updates["stats_buffer"])

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def body(carry, mb):
            grads, stats, tot, lm, aux = carry
            (t, (l, a, stats)), g = grad_fn(state.params, stats, mb)
            grads = jax.tree.map(jnp.add, grads, g)
            return (grads, stats, tot + t, lm + l, aux + a), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        zero = jnp.zeros((), jnp.float32)
        # the apply returns a plain dict collection; unfreeze for a
        # structurally-stable scan carry
        stats0 = flax.core.unfreeze(state.stats_buffer)
        (grads, new_stats, total_loss, lm_loss, aux_loss), _ = jax.lax.scan(
            body,
            (zero_grads, stats0, zero, zero, zero),
            micro,
        )
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(stats_buffer=new_stats)
        metrics = {
            "loss/total": total_loss * inv,
            "loss/lm": lm_loss * inv,
            "loss/aux": aux_loss * inv,
            "training/grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return accum_train_step


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
