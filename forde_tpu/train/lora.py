"""LoRA parameter-efficient fine-tuning for the decoder LM.

A capability the reference lacks entirely (it is pretrain-only,
src/training/train.py): freeze a base checkpoint and train low-rank
adapters over selected projection kernels,

    W_eff = W + (alpha / rank) * A @ B,   A: (..., in, r), B: (..., r, out)

with A ~ N(0, 1/sqrt(in)) and B = 0, so the merged model equals the base
exactly at init. Only the adapters carry gradients and optimizer state —
for a d_model=768 tower at rank 8 that is ~1% of the base parameter
count, so Adam moments and checkpoints shrink ~100x.

TPU-first shape: the merge is expressed INSIDE the jitted step as one
rank-r einsum per target kernel (negligible FLOPs next to the matmuls
that consume W_eff; XLA fuses the add into the consumer), and the frozen
base is a jit *argument*, not a captured constant — it stays resident in
HBM across steps without being baked into the executable. Adapter
leading dims mirror the base leaf, so scan-stacked (L, in, out) layers
and stacked MoE expert banks (E, in, out) / (L, E, in, out) adapt with
the same einsum.

Serving: checkpoints record {rank, alpha, targets, base} in the train
meta; ``train/checkpoint.load_lm_state`` rebuilds the adapter state,
restores it, and returns the base with adapters MERGED INTO THE WEIGHTS
— zero inference overhead, and every downstream surface (serve CLI,
speculative drafts, distillation teachers, int8 quantization) works on a
LoRA checkpoint unchanged.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from flax.core import freeze, unfreeze

from forde_tpu.train.state import TrainState

# Attention projections by default (the standard LoRA recipe); add
# "w_up,w_down" to adapt the stacked MoE expert banks too.
DEFAULT_TARGETS = ("qkv_proj", "out_proj", "q_proj", "k_proj", "v_proj")


def _is_target(path: Tuple[str, ...], leaf, targets: Sequence[str]) -> bool:
    """A leaf is adapted if it is a >=2-D 'kernel' whose module name ends
    with a target (endswith so 'out_proj' covers compressed_out_proj /
    topk_out_proj), or a direct >=2-D leaf named by a target (the MoE
    expert banks 'w_up'/'w_down', which are parameters, not submodules)."""
    if getattr(leaf, "ndim", 0) < 2:
        return False
    if path[-1] == "kernel" and len(path) >= 2:
        return any(path[-2].endswith(t) for t in targets)
    return path[-1] in targets


def init_lora(
    base_params,
    rank: int,
    rng: jax.Array,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
):
    """Adapter tree: mirrors ``base_params`` down to each target kernel,
    whose leaf is replaced by {"lora_a": (..., in, r), "lora_b": (..., r,
    out)}. Raises if no leaf matches (a typo'd --lora_targets should be
    loud, not a silent full freeze)."""
    flat = traverse_util.flatten_dict(unfreeze(base_params))
    out = {}
    paths = sorted(p for p, leaf in flat.items() if _is_target(p, leaf, targets))
    if not paths:
        raise ValueError(
            f"lora targets {tuple(targets)} matched no kernel in the param "
            f"tree; available >=2-D leaves: "
            f"{sorted({p[-1] if p[-1] != 'kernel' else p[-2] for p, l in flat.items() if getattr(l, 'ndim', 0) >= 2})}"
        )
    keys = jax.random.split(rng, len(paths))
    for key, path in zip(keys, paths):
        leaf = flat[path]
        *lead, fan_in, fan_out = leaf.shape
        a = jax.random.normal(
            key, (*lead, fan_in, rank), dtype
        ) / jnp.sqrt(jnp.asarray(fan_in, dtype))
        b = jnp.zeros((*lead, rank, fan_out), dtype)
        out[path + ("lora_a",)] = a
        out[path + ("lora_b",)] = b
    return freeze(traverse_util.unflatten_dict(out))


def merge_lora(base_params, adapters, scale: float):
    """base + scale * A @ B at every adapted kernel (cast to the base
    leaf's dtype). Pure function of (base, adapters) — used both inside
    the jitted train step and once at serve-time load."""
    flat = traverse_util.flatten_dict(unfreeze(base_params))
    aflat = traverse_util.flatten_dict(unfreeze(adapters))
    for path in {p[:-1] for p in aflat}:
        a = aflat[path + ("lora_a",)]
        b = aflat[path + ("lora_b",)]
        base = flat[path]
        delta = jnp.einsum("...ir,...ro->...io", a, b) * scale
        flat[path] = (base.astype(jnp.float32) + delta.astype(jnp.float32)).astype(base.dtype)
    return freeze(traverse_util.unflatten_dict(flat))


def adapter_param_count(adapters) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(adapters))


def create_lora_train_state(
    full_state: TrainState,
    base_params,
    rank: int,
    rng: jax.Array,
    tx: optax.GradientTransformation,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> TrainState:
    """A TrainState whose ``params`` are the adapters (so apply_gradients,
    EMA, checkpointing, and sharding all see only the trainable tree);
    apply_fn/stats_buffer come from the regular full state."""
    adapters = init_lora(base_params, rank, rng, targets)
    return TrainState.create(
        apply_fn=full_state.apply_fn,
        params=adapters,
        tx=tx,
        stats_buffer=full_state.stats_buffer,
    )


def make_lora_train_step(scale: float, aux_loss_weight: float = 1.0):
    """Jitted step over (adapter_state, base_params, batch): merge ->
    forward -> CE + aux -> grads w.r.t. ADAPTERS ONLY -> optimizer.
    ``base_params`` is a device argument (never donated, never
    differentiated); the stats_buffer threads exactly as in train_step."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def lora_train_step(
        state: TrainState, base_params, batch: Dict
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(adapters):
            merged = merge_lora(base_params, adapters, scale)
            (logits, aux_loss), updates = state.apply_fn(
                {"params": merged, "stats_buffer": state.stats_buffer},
                batch["input_ids"],
                mutable=["stats_buffer"],
            )
            lm_loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1, :].astype(jnp.float32),
                batch["input_ids"][:, 1:],
            ).mean()
            total = lm_loss + aux_loss_weight * aux_loss
            return total, (lm_loss, aux_loss, updates["stats_buffer"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (lm, aux, new_stats)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(stats_buffer=new_stats)
        metrics = {
            "loss/total": total,
            "loss/lm": lm,
            "loss/aux": aux,
            "training/grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return lora_train_step


def lora_scale(rank: int, alpha: float) -> float:
    return float(alpha) / float(rank)


def parse_targets(spec: Optional[str]) -> Tuple[str, ...]:
    if not spec:
        return DEFAULT_TARGETS
    return tuple(t.strip() for t in spec.split(",") if t.strip())
