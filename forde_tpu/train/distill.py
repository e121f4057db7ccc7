"""Knowledge distillation: train a (small) student against a frozen
teacher's logits.

No reference analog (the reference trains one model against data only,
src/training/train.py). The motivating workflow here is speculative
decoding (models/speculative.py): distill a 1-2 layer draft from the
full target so the draft's proposals get accepted often.

Loss per step (Hinton et al.):

    total = alpha * CE(student, shifted labels)
          + (1 - alpha) * T^2 * KL( softmax(teacher/T) || softmax(student/T) )
          + aux_loss_weight * moe_aux

The teacher forward runs under ``stop_gradient`` INSIDE the same jitted
program as the student's forward/backward — one fused computation, no
second dispatch; teacher params ride along as ordinary inputs so XLA
keeps them device-resident.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from forde_tpu.train.state import TrainState


def make_distill_step(
    teacher_model,
    teacher_variables,
    aux_loss_weight: float = 0.0,
    alpha: float = 0.5,
    temperature: float = 2.0,
):
    """Build a jitted ``(state, batch) -> (state, metrics)`` distillation
    step. ``teacher_variables`` must share the student's vocab."""
    t_vars = {
        "params": teacher_variables["params"],
        "stats_buffer": teacher_variables.get("stats_buffer", {}),
    }

    @functools.partial(jax.jit, donate_argnums=(0,))
    def distill_step(
        state: TrainState, batch: Dict
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        input_ids = batch["input_ids"]
        (t_logits, _), _ = teacher_model.apply(
            t_vars, input_ids, mutable=["stats_buffer"]
        )
        t_logits = jax.lax.stop_gradient(t_logits.astype(jnp.float32))

        def loss_fn(params):
            (logits, aux_loss), updates = state.apply_fn(
                {"params": params, "stats_buffer": state.stats_buffer},
                input_ids,
                mutable=["stats_buffer"],
            )
            logits = logits.astype(jnp.float32)
            lm_loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1, :], input_ids[:, 1:]
            ).mean()
            t_lp = jax.nn.log_softmax(t_logits / temperature, axis=-1)
            s_lp = jax.nn.log_softmax(logits / temperature, axis=-1)
            kl = (
                jnp.exp(t_lp) * (t_lp - s_lp)
            ).sum(-1).mean() * temperature**2
            total = (
                alpha * lm_loss
                + (1.0 - alpha) * kl
                + aux_loss_weight * aux_loss
            )
            return total, (lm_loss, kl, aux_loss, updates["stats_buffer"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (lm_loss, kl, aux_loss, new_stats)), grads = grad_fn(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(stats_buffer=new_stats)
        return new_state, {
            "loss/total": total,
            "loss/lm": lm_loss,
            "loss/kl": kl,
            "loss/aux": aux_loss,
            "training/grad_norm": optax.global_norm(grads),
        }

    return distill_step


def load_teacher(checkpoint_dir: str):
    """Teacher (model, variables) from a train.loop checkpoint carrying
    model_config.json (the shared restore recipe,
    train/checkpoint.load_lm_state)."""
    from forde_tpu.models.decoder_lm import FORDEDecoderLM
    from forde_tpu.train.checkpoint import load_lm_state

    cfg, state = load_lm_state(checkpoint_dir)
    model = FORDEDecoderLM(config=cfg)
    return model, {
        "params": state.params, "stats_buffer": state.stats_buffer,
    }
