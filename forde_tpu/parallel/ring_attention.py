"""Ring attention: context parallelism over the ``context`` mesh axis.

The reference's only long-context mechanism is NSA masking within one
device (SURVEY.md §5); this is the TPU-native scaling layer beyond one
chip: the sequence is sharded over the ``context`` axis, each device holds
its Q shard permanently, and K/V shards rotate around the ring via
``lax.ppermute`` over ICI while an online-softmax accumulator merges block
contributions — full attention over the global sequence with per-device
memory O(S_global / n_devices).

Round-2: each per-shard block attention runs on the Pallas flash
kernels (bf16 MXU operands, scores never materialized) and partials
merge via differentiable log-sum-exp (flash_attention_with_lse — the
lse cotangent folds into the kernels' backward as a delta shift).
Future shards are computed-and-killed in the merge; a zigzag schedule
balancing causal work across the ring remains a known follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_CONTEXT, AXIS_DATA

NEG_INF = -1e30


def _merge_lse(o_acc, lse_acc, o_b, lse_b):
    """Exact softmax merge of two partial attentions over disjoint keys."""
    m = jnp.maximum(lse_acc, lse_b)
    w_a = jnp.exp(lse_acc - m)
    w_b = jnp.exp(lse_b - m)
    denom = w_a + w_b
    o = (o_acc * w_a + o_b.astype(jnp.float32) * w_b) / denom
    return o, m + jnp.log(denom)


def _ring_body(q, k, v, *, axis_name: str, num_shards: int, scale, causal):
    """Per-shard body: local Q vs rotating K/V shards.

    Each shard's block attention runs on the flash kernels
    (``flash_attention_with_lse`` — bf16 MXU operands, no materialized
    scores) and partial results merge via log-sum-exp. Ring step 0 is
    always the diagonal shard (local-causal); step >= 1 shards are
    entirely past (plain attention) or entirely future (killed in the
    merge by lse = -inf). The lse cotangent flows through the kernels'
    backward as a delta adjustment, so the whole ring is differentiable.
    """
    from forde_tpu.ops.flash_attention import flash_attention_with_lse

    idx = jax.lax.axis_index(axis_name)

    # step 0: the K/V still at home == this shard's own block (diagonal).
    o_acc, lse_acc = flash_attention_with_lse(q, k, v, causal=causal,
                                              scale=scale)
    o_acc = o_acc.astype(jnp.float32)

    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    for step in range(1, num_shards):
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        src = (idx - step) % num_shards  # global block these K/V came from
        o_b, lse_b = flash_attention_with_lse(q, k, v, causal=False,
                                              scale=scale)
        if causal:
            # future shards contribute nothing: kill them in the merge
            is_past = (src < idx)[None, None, None, None]
            lse_b = jnp.where(is_past, lse_b, NEG_INF)
        o_acc, lse_acc = _merge_lse(o_acc, lse_acc, o_b, lse_b)

    return o_acc.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    scale: float | None = None,
    axis_name: str = AXIS_CONTEXT,
) -> jnp.ndarray:
    """Full (or causal) attention over (B, H, S_global, D) with the
    sequence dimension sharded over ``axis_name``.

    S_global must be divisible by the axis size. Output has the same
    sharding as ``q``.
    """
    num_shards = mesh.shape[axis_name]
    if q.shape[2] % num_shards:
        raise ValueError(
            f"sequence {q.shape[2]} not divisible by {num_shards} shards"
        )
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5

    # Batch stays sharded over ``data`` so ring attention composes with DP
    # (a None batch spec would silently all-gather the batch).
    batch_axis = AXIS_DATA if AXIS_DATA in mesh.shape else None
    spec = P(batch_axis, None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_body,
            axis_name=axis_name,
            num_shards=num_shards,
            scale=float(scale),
            causal=causal,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
