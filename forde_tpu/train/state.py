"""Train state: params + optimizer + FORDE stats buffer.

Parity target: reference src/training/train.py:48-84 — a TrainState carrying
the ``stats_buffer`` mutable collection alongside params, with an
optax chain of global-norm clipping and AdamW.

TPU-first: the state is placed onto the mesh with explicit NamedShardings
(expert-stacked parameters sharded over the ``expert`` axis, everything else
replicated) so jitted steps run under pjit semantics with XLA-inserted
collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax.training import train_state
from jax.sharding import Mesh

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import LLMConfig
from forde_tpu.models.decoder_lm import FORDEDecoderLM


class TrainState(train_state.TrainState):
    """TrainState + stats_buffer (reference train.py:48-51).

    ``ema_params`` is None unless --ema_decay enabled it (train/ema.py);
    when present it mirrors the param tree and checkpoints/shards with it.
    """

    stats_buffer: core.FrozenDict[str, Any] = core.FrozenDict()
    ema_params: Any = None


def make_lr_schedule(
    learning_rate: float,
    warmup_steps: int = 0,
    lr_schedule: str = "constant",
    decay_steps: int = 0,
    min_lr_ratio: float = 0.0,
):
    """LR as a function of step: linear warmup (0 -> peak over
    ``warmup_steps``) into either a constant or a cosine decay
    (peak -> ``min_lr_ratio``*peak over ``decay_steps``, counted AFTER
    warmup; the tail holds at the floor). Returns a float when the whole
    schedule is constant — optax then keeps the stateless scale, so
    existing checkpoints' opt-state trees are unchanged."""
    if lr_schedule not in ("constant", "cosine"):
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    if lr_schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs decay_steps > 0")
        tail = optax.cosine_decay_schedule(
            learning_rate, decay_steps, alpha=min_lr_ratio
        )
    else:
        tail = optax.constant_schedule(learning_rate)
    if warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps), tail],
            [warmup_steps],
        )
    if lr_schedule == "constant":
        return learning_rate  # plain float: stateless LR scaling
    return tail


def make_optimizer(
    learning_rate: float,
    weight_decay: float,
    grad_clip_norm: float = 1.0,
    warmup_steps: int = 0,
    moment_dtype: Optional[str] = None,
    lr_schedule: str = "constant",
    decay_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) -> adamw (reference train.py:74-77).

    ``warmup_steps`` > 0 ramps the LR linearly from 0 — without it the
    contrastive dual encoder falls into the uniform-softmax saddle (loss
    pinned at ln(B), grads ~1e-3) within the first ~50 steps at practical
    peak LRs; measured on v5e, warmup escapes it.

    ``lr_schedule``/``decay_steps``/``min_lr_ratio``: optional cosine
    decay after warmup (see ``make_lr_schedule``). Any non-constant
    schedule makes the LR scale STATEFUL (ScaleByScheduleState) — the
    flags are recorded in the checkpoint train meta so restore rebuilds
    the same tree.

    ``moment_dtype`` (e.g. "bfloat16") stores BOTH Adam moments in that
    dtype — halves the ~2.2 GB/step of fp32 moment HBM traffic at ViT-B
    scale; update math stays fp32 (see train/optim.py). None keeps exact
    optax.adamw/reference behavior.
    """
    lr = make_lr_schedule(
        learning_rate, warmup_steps, lr_schedule, decay_steps, min_lr_ratio
    )
    if moment_dtype:
        from forde_tpu.train.optim import adamw_lowp

        tx = adamw_lowp(
            learning_rate=lr,
            weight_decay=weight_decay,
            moment_dtype=jnp.dtype(moment_dtype),
        )
    else:
        tx = optax.adamw(learning_rate=lr, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)


def create_train_state(
    config: LLMConfig,
    rng: jax.Array,
    learning_rate: float,
    weight_decay: float,
    grad_clip_norm: float = 1.0,
    init_batch_shape=(1, 64),
    mesh: Optional[Mesh] = None,
    warmup_steps: int = 0,
    moment_dtype: Optional[str] = None,
    lr_schedule: str = "constant",
    decay_steps: int = 0,
    min_lr_ratio: float = 0.0,
) -> TrainState:
    """Initialize model + optimizer (reference create_train_state,
    train.py:54-84).

    ``mesh`` activates the explicit-parallel model paths (shard_map EP for
    moe_dispatch="ep", ring attention when the context axis is >1) — it
    becomes part of apply_fn. Init always runs un-meshed on small shapes.
    """
    model = FORDEDecoderLM(config=config, mesh=mesh)
    init_model = model
    if mesh is not None:
        # Param trees are identical across dispatch/attention modes; init
        # through the un-meshed capacity path so the tiny init batch never
        # hits shard_map (EP) or ring attention.
        init_cfg = config
        if config.moe_dispatch == "ep":
            init_cfg = dataclasses.replace(config, moe_dispatch="capacity")
        init_model = FORDEDecoderLM(config=init_cfg)
    dummy = jnp.ones(init_batch_shape, dtype=jnp.int32)
    variables = init_model.init(rng, dummy)
    params = variables["params"]
    stats_buffer = variables.get("stats_buffer", core.FrozenDict())
    tx = make_optimizer(
        learning_rate, weight_decay, grad_clip_norm, warmup_steps,
        moment_dtype=moment_dtype, lr_schedule=lr_schedule,
        decay_steps=decay_steps, min_lr_ratio=min_lr_ratio,
    )
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, stats_buffer=stats_buffer
    )


def shard_train_state(
    state: TrainState, mesh: Optional[Mesh], param_sharding: str = "replicated"
) -> TrainState:
    """Place the whole train state onto the mesh.

    Expert-stacked params (and their optimizer moments) shard over the
    ``expert`` axis; tensor-parallel leaves over ``model``
    (mesh.tp_param_spec); everything else is replicated — unless
    ``param_sharding="fsdp"``, which additionally shards every remaining
    param/moment leaf's largest free dim over ``data`` (ZeRO-3-style:
    XLA all-gathers weights per use and reduce-scatters gradients, so
    per-device param+moment memory drops ~data-axis-fold for the cost of
    one weight all-gather per layer per step). On a trivial mesh this is
    a plain device_put.
    """
    if mesh is None:
        return state
    shardings = state_shardings(state, mesh, param_sharding)
    return jax.device_put(state, shardings)


def state_shardings(
    state: TrainState, mesh: Mesh, param_sharding: str = "replicated"
):
    """NamedShardings for every leaf of the train state (params rule applied
    to params and to optimizer moments, which mirror the param tree)."""
    if param_sharding not in ("replicated", "fsdp"):
        raise ValueError(f"unknown param_sharding {param_sharding!r}")
    fsdp = param_sharding == "fsdp"
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_sharding(path, leaf, mesh, fsdp), state
    )


def _leaf_sharding(path, leaf, mesh, fsdp: bool = False):
    names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    expert_axis = mesh.shape[mesh_lib.AXIS_EXPERT]
    model_axis = mesh.shape.get(mesh_lib.AXIS_MODEL, 1)
    data_axis = mesh.shape.get(mesh_lib.AXIS_DATA, 1)
    pipe_axis = mesh.shape.get(mesh_lib.AXIS_PIPE, 1)
    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return mesh_lib.replicated(mesh)
    spec = [None] * leaf.ndim
    in_layer_stack = "layers" in names
    if (
        pipe_axis > 1
        and in_layer_stack
        and leaf.shape[0] % pipe_axis == 0
    ):
        # pipeline stages own contiguous slices of the (L,)-stacked
        # scan layers — params AND moments live stage-sharded at rest,
        # matching parallel/pipeline.pp_forward's P('pipe') in_specs
        # (no per-step resharding, per-device state drops ~pipe-fold).
        spec[0] = mesh_lib.AXIS_PIPE
    elif (
        expert_axis > 1
        and "experts" in names
        and not in_layer_stack  # scanned experts are (L, E, ...): dim 0
        # is the layer stack, not the expert dim — see next branch
        and leaf.shape[0] % expert_axis == 0
    ):
        spec[0] = mesh_lib.AXIS_EXPERT
    if (
        expert_axis > 1
        and "experts" in names
        and in_layer_stack
        and leaf.ndim >= 2
        and leaf.shape[1] % expert_axis == 0
    ):
        # scanned expert bank (L, E, ...): expert dim is dim 1. Composes
        # with pipe on dim 0 (data x expert x pipe — PP x EP via GSPMD
        # capacity dispatch, parallel/pipeline.py docstring).
        spec[1] = mesh_lib.AXIS_EXPERT
    if model_axis > 1:
        tp = mesh_lib.tp_param_spec(names, leaf)
        if tp is not None:
            dim = next(
                i for i, a in enumerate(tp) if a == mesh_lib.AXIS_MODEL
            )
            if leaf.shape[dim] % model_axis == 0 and spec[dim] is None:
                spec[dim] = mesh_lib.AXIS_MODEL
    if (
        fsdp
        and data_axis > 1
        # params + their optimizer moments only: the stats_buffer feeds
        # the slow loop whole, and tiny leaves aren't worth a collective
        and "stats_buffer" not in names
        and leaf.size >= 2 * data_axis
    ):
        for dim in sorted(
            range(leaf.ndim), key=lambda i: -leaf.shape[i]
        ):
            if spec[dim] is None and leaf.shape[dim] % data_axis == 0:
                spec[dim] = mesh_lib.AXIS_DATA
                break
    return mesh_lib.logical_to_sharding(mesh, *spec)
