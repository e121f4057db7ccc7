"""Dual-encoder (CLIP) train state and jitted train step with full FORDE
sensing.

The fast loop here realizes what the reference only prototyped
(tests/reproduce_grad_sink.py): per-neuron gradient statistics are
harvested *inside the same backward pass as the weight gradients* by
differentiating w.r.t. the StatefulLayers' zero-valued gradient taps
(``perturbations`` collection) — one fused XLA computation per step, no
second backward. Activation stats accumulate in the ``stats_buffer``
collection; gradient stats accumulate in ``grad_stats`` on the train state
(same tree structure as the taps, leaves reduced to (F, 2) sums).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax.training import train_state

from forde_tpu.core.config import DualEncoderConfig
from forde_tpu.models.dual_encoder import FORDEDualEncoder, clip_contrastive_loss
from forde_tpu.train.state import make_optimizer


class CLIPTrainState(train_state.TrainState):
    """TrainState + FORDE state: brain map, activation-stat buffer,
    gradient-stat accumulator, and the zero tap template."""

    brain: core.FrozenDict[str, Any] = core.FrozenDict()
    stats_buffer: core.FrozenDict[str, Any] = core.FrozenDict()
    perturbations: core.FrozenDict[str, Any] = core.FrozenDict()
    grad_stats: core.FrozenDict[str, Any] = core.FrozenDict()
    grad_step_count: jnp.ndarray = None
    # None unless --ema_decay enabled it (train/ema.py)
    ema_params: Any = None


def create_clip_train_state(
    config: DualEncoderConfig,
    rng: jax.Array,
    learning_rate: float,
    weight_decay: float,
    batch_size: int,
    text_len: Optional[int] = None,
    grad_clip_norm: float = 1.0,
    warmup_steps: int = 0,
    moment_dtype: Optional[str] = None,
    lr_schedule: str = "constant",
    decay_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> CLIPTrainState:
    """Initialize with REAL batch shapes: the gradient taps are shaped like
    the activations they tap, so init must see the training batch shape."""
    model = FORDEDualEncoder(config=config)
    text_len = text_len or config.max_text_len
    images = jnp.zeros(
        (batch_size, config.image_size, config.image_size, 3), jnp.float32
    )
    input_ids = jnp.zeros((batch_size, text_len), jnp.int32)
    attention_mask = jnp.ones((batch_size, text_len), jnp.int32)
    variables = model.init(rng, images, input_ids, attention_mask)

    # Tap slots are already (F, 2) stat buffers (ops/stateful.grad_stat_tap),
    # so the accumulator tree is just zeros of the same structure.
    perturbations = variables.get("perturbations", core.FrozenDict())
    grad_stats = jax.tree.map(jnp.zeros_like, perturbations)
    return CLIPTrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=make_optimizer(
            learning_rate, weight_decay, grad_clip_norm, warmup_steps,
            moment_dtype=moment_dtype, lr_schedule=lr_schedule,
            decay_steps=decay_steps, min_lr_ratio=min_lr_ratio,
        ),
        brain=variables.get("brain", core.FrozenDict()),
        stats_buffer=variables.get("stats_buffer", core.FrozenDict()),
        perturbations=perturbations,
        grad_stats=grad_stats,
        grad_step_count=jnp.array(0, jnp.int32),
    )


def _loss_fn(params, taps, state: CLIPTrainState, batch: Dict):
    (img_emb, txt_emb, logit_scale), updates = state.apply_fn(
        {
            "params": params,
            "brain": state.brain,
            "stats_buffer": state.stats_buffer,
            "perturbations": taps,
        },
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        mutable=["stats_buffer"],
    )
    loss, metrics = clip_contrastive_loss(img_emb, txt_emb, logit_scale)
    return loss, (metrics, updates["stats_buffer"], img_emb, txt_emb)


@functools.partial(jax.jit, donate_argnums=(0,))
def clip_train_step(
    state: CLIPTrainState, batch: Dict
) -> Tuple[CLIPTrainState, Dict[str, jnp.ndarray]]:
    """One contrastive step + sensing harvest, all fused under jit."""
    taps = jax.tree.map(jnp.zeros_like, state.perturbations)
    grad_fn = jax.value_and_grad(_loss_fn, argnums=(0, 1), has_aux=True)
    (loss, (metrics, new_stats, _, _)), (grads, tap_grads) = grad_fn(
        state.params, taps, state, batch
    )

    # tap cotangents ARE the per-step (F, 2) gradient stats
    new_grad_stats = jax.tree.map(
        lambda acc, g: acc + g, state.grad_stats, tap_grads
    )
    new_state = state.apply_gradients(grads=grads)
    new_state = new_state.replace(
        stats_buffer=new_stats,
        grad_stats=new_grad_stats,
        grad_step_count=state.grad_step_count + 1,
    )
    out = {
        "loss/contrastive": loss,
        "training/grad_norm": optax.global_norm(grads),
        **metrics,
    }
    return new_state, out


def make_nosense_step(config: DualEncoderConfig):
    """Jitted contrastive step with sensing compiled OUT — the other half
    of the sensing stride.

    FORDE sensing (three fp32 moment reductions over every StatefulLayer's
    (B, S, F) pre-activation in the forward + the grad-tap reductions in
    the backward) profiles at ~29% of the ViT-B/128 step (the
    convert/multiply_reduce fusions, PERF.md round-3). The slow loop only
    consumes time-AVERAGED statistics over `slow_loop_interval` (default
    100) steps, so sensing every k-th step leaves the brain update's
    inputs statistically unchanged while paying the reduction bytes once
    per k steps. The stride alternates `clip_train_step` (sensed) with
    this step (unsensed): stats_buffer / grad_stats / grad_step_count
    pass through untouched, so the existing normalize-by-step_count
    contract (brain/neuron_slow_loop.py) needs no change.

    In-step subsampling was the round-2 negative (strided/prefix slices
    break producer fusion: 6,663 -> 4,947 pairs/s, nn/stateful.py NOTE);
    striding across steps sidesteps that entirely — both variants are
    separately compiled whole-step programs.
    """
    model = FORDEDualEncoder(config=config.replace(sense=False))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: CLIPTrainState, batch: Dict):
        def loss_fn(params):
            img_emb, txt_emb, logit_scale = model.apply(
                {"params": params, "brain": state.brain},
                batch["image"],
                batch["input_ids"],
                batch.get("attention_mask"),
            )
            loss, metrics = clip_contrastive_loss(img_emb, txt_emb, logit_scale)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        out = {
            "loss/contrastive": loss,
            "training/grad_norm": optax.global_norm(grads),
            **metrics,
        }
        return new_state, out

    return step


@jax.jit
def clip_eval_embeddings(state: CLIPTrainState, batch: Dict):
    """Forward-only embeddings (no sensing mutation)."""
    (img_emb, txt_emb, logit_scale), _ = state.apply_fn(
        {
            "params": state.params,
            "brain": state.brain,
            "stats_buffer": state.stats_buffer,
        },
        batch["image"],
        batch["input_ids"],
        batch.get("attention_mask"),
        mutable=["stats_buffer"],
    )
    return img_emb, txt_emb, logit_scale
