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


def make_fused_step(
    config: DualEncoderConfig,
    n_steps: int,
    sense_interval: int = 1,
    sensed_step=None,
    nosense_step=None,
):
    """``n_steps`` optimizer steps in ONE jitted program over a stacked
    batch — the production shape once batches are device-resident
    (data/prefetch.py): per-step dispatch through the host costs ~2 ms
    on the axon tunnel (PERF.md round 2), real overhead against a
    ~50 ms step.

    The sensing stride is expressed STATICALLY — an outer ``lax.scan``
    over groups of [1 sensed step + an inner scan of
    ``sense_interval - 1`` unsensed steps] — never as a ``lax.cond`` on
    the step index: a cond forces the full carry (params + moments +
    stats) to materialize at the branch join every step, destroying the
    fusion that makes the unsensed step cheap (measured on chip as the
    entire sense-stride gain vanishing, 9,501 → 9,319 pairs/s; PERF.md
    round 4).

    ``sensed_step``/``nosense_step`` default to ``clip_train_step`` /
    ``make_nosense_step(config)``; pass EMA-wrapped variants to keep
    ``--ema_decay`` semantics. Requires ``n_steps %% sense_interval ==
    0`` so every fused call runs whole groups. Step order (and
    therefore math) is identical to the unfused loop — sensed at
    offsets 0, k, 2k, …

    Usage: ``fused(state, fused.prepare(stacked))`` where ``stacked``
    has a leading ``(n_steps,)`` axis (``stack_batches``); ``prepare``
    splits it once into scan operands (see its docstring for why) and
    can be applied ahead of time — e.g. once per pooled super-batch.
    Returns ``(state, metrics-of-last-step)``.
    """
    sensed = sensed_step if sensed_step is not None else clip_train_step
    group = int(sense_interval) if sense_interval > 1 else 1
    if n_steps <= 0 or n_steps % group:
        raise ValueError(
            f"n_steps ({n_steps}) must be a positive multiple of "
            f"sense_interval ({group})"
        )
    nosense = None
    if group > 1:
        nosense = (
            nosense_step if nosense_step is not None
            else make_nosense_step(config)
        )
    n_groups = n_steps // group

    @jax.jit
    def prepare(stacked: Dict):
        """(n_steps, ...) super-batch → (sensed, unsensed) scan operands.

        Splitting OUTSIDE the scan matters for memory: slicing
        ``gb[1:]`` inside the scan body materializes a copy of
        (group-1)/group of the whole super-batch as an HLO temp every
        program — at fuse 32 / batch 512 / 224px that temp alone was
        4.45 GB and OOM'd a 15.75 GB v5e. As pre-split operands, the
        scan reads its per-iteration slices in place."""
        g = jax.tree.map(
            lambda x: x.reshape((n_groups, group) + x.shape[1:]), stacked
        )
        first = jax.tree.map(lambda x: x[:, 0], g)
        rest = (
            jax.tree.map(lambda x: x[:, 1:], g) if group > 1 else None
        )
        return first, rest

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused(state: CLIPTrainState, prepared):
        first_all, rest_all = prepared

        def body(carry, xs):
            fb, rb = xs
            s, m = sensed(carry, fb)
            if group > 1:
                def inner(c, b):
                    return nosense(c, b)

                s, ms = jax.lax.scan(inner, s, rb)
                m = jax.tree.map(lambda x: x[-1], ms)
            return s, m

        state, ms = jax.lax.scan(body, state, (first_all, rest_all))
        return state, jax.tree.map(lambda x: x[-1], ms)

    fused.prepare = prepare
    return fused


def stack_batches(batch_iter, n: int, sharding=None):
    """Group a device-batch iterator into stacked ``(n, ...)`` super-
    batches for ``make_fused_step``. Drops a final partial group (an
    epoch tail shorter than ``n``). ``sharding`` (e.g.
    ``core.mesh.stacked_batch_sharding``) pins the stacked layout —
    scan axis unsharded, batch axis over ``data`` — instead of leaving
    it to inference from the per-batch inputs."""
    buf = []
    for b in batch_iter:
        buf.append(b)
        if len(buf) == n:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *buf)
            if sharding is not None:
                stacked = jax.device_put(stacked, sharding)
            yield stacked
            buf = []


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
