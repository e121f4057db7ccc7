"""Ring attention: context parallelism over the ``context`` mesh axis.

The reference's only long-context mechanism is NSA masking within one
device (SURVEY.md §5); this is the TPU-native scaling layer beyond one
chip: the sequence is sharded over the ``context`` axis, each device holds
its Q shard permanently, and K/V shards rotate around the ring via
``lax.ppermute`` over ICI while an online-softmax accumulator merges block
contributions — full attention over the global sequence with per-device
memory O(S_global / n_devices).

Round-1 implementation notes:
  * the per-block attention is blockwise jnp math in fp32 (the Pallas
    flash kernel handles the single-chip case; fusing it into the ring
    body is a planned optimization);
  * causal masking is handled by block offset: blocks entirely in the
    future are computed-and-masked rather than skipped (a zigzag schedule
    that balances causal work across the ring is a known follow-up).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_CONTEXT, AXIS_DATA

NEG_INF = -1e30


def _block_attention_merge(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_offset: jnp.ndarray,
    k_offset: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    scale: float,
    causal: bool,
):
    """Merge one KV block into the online-softmax state (m, l, acc)."""
    m_prev, l_prev, acc = state
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if causal:
        sq, sk = q.shape[2], k.shape[2]
        q_pos = q_offset + jnp.arange(sq)[:, None]
        k_pos = k_offset + jnp.arange(sk)[None, :]
        s = jnp.where((q_pos >= k_pos)[None, None], s, NEG_INF)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def _ring_body(q, k, v, *, axis_name: str, num_shards: int, scale, causal):
    """Per-shard body: local Q vs rotating K/V shards."""
    idx = jax.lax.axis_index(axis_name)
    b, h, s_loc, d = q.shape
    qf = q.astype(jnp.float32)
    q_offset = idx * s_loc

    m = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc = jnp.zeros((b, h, s_loc, d), jnp.float32)
    state = (m, l, acc)

    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    for step in range(num_shards):
        src = (idx - step) % num_shards  # global block these K/V came from
        state = _block_attention_merge(
            qf, k.astype(jnp.float32), v.astype(jnp.float32),
            q_offset, src * s_loc, state, scale, causal,
        )
        if step + 1 < num_shards:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)

    m, l, acc = state
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (acc / l_safe).astype(q.dtype)


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
