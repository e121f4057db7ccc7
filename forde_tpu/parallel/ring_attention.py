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

Round-3: ``zigzag_ring_attention`` — the load-balanced causal schedule.
The plain ring computes every future K/V shard and kills it in the merge
(device 0 wastes (n-1)/n of its ring FLOPs). Zigzag splits the global
sequence into 2n chunks and gives device d chunks (d, 2n-1-d); then at
every ring step each device computes exactly TWO half-chunk blocks that
are statically entirely-past (plus the step-0 diagonal), so causal work
is uniform across the ring and no block is ever discarded. Inputs/outputs
stay contiguous-sharded — the zigzag layout lives only inside (two
ppermute redistributions each way).
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


def _zigzag_body(q, k, v, *, axis_name: str, num_shards: int, scale):
    """Load-balanced causal ring body (zigzag chunk layout).

    Local inputs are contiguous (B, H, 2c, D) shards (chunks 2d, 2d+1 of
    the 2n-chunk global split). The body redistributes to the zigzag
    layout — device d holds chunks (d, 2n-1-d) — with two ppermutes,
    runs the balanced schedule (every ring step computes exactly two
    half-chunk blocks that are STATICALLY entirely-past; nothing is
    computed-and-killed), and redistributes the output back.
    """
    from forde_tpu.ops.flash_attention import flash_attention_with_lse

    n = num_shards
    d = jax.lax.axis_index(axis_name)
    two_c = q.shape[2]
    c = two_c // 2

    def halves(x):
        return x[:, :, :c], x[:, :, c:]

    def owner(chunk: int) -> int:
        return chunk if chunk < n else 2 * n - 1 - chunk

    # ---- contiguous -> zigzag ------------------------------------------
    perm_even = [(j, owner(2 * j)) for j in range(n)]
    perm_odd = [(j, owner(2 * j + 1)) for j in range(n)]
    is_even = (d % 2 == 0)[None, None, None, None]

    def to_zigzag(x):
        front, back = halves(x)
        recv_e = jax.lax.ppermute(front, axis_name, perm_even)
        recv_o = jax.lax.ppermute(back, axis_name, perm_odd)
        # even devices get their lo (chunk j) via the even perm,
        # odd devices via the odd perm (see chunk-id derivation above)
        lo = jnp.where(is_even, recv_e, recv_o)
        hi = jnp.where(is_even, recv_o, recv_e)
        return lo, hi

    q_lo, q_hi = to_zigzag(q)
    k_lo, k_hi = to_zigzag(k)
    v_lo, v_hi = to_zigzag(v)

    # ---- step 0: diagonal + the local strictly-past block --------------
    o_lo, lse_lo = flash_attention_with_lse(q_lo, k_lo, v_lo, causal=True,
                                            scale=scale)
    o_hi, lse_hi = flash_attention_with_lse(q_hi, k_hi, v_hi, causal=True,
                                            scale=scale)
    o_lo = o_lo.astype(jnp.float32)
    o_hi = o_hi.astype(jnp.float32)
    # q chunk (2n-1-d) is always strictly after k chunk d
    o_b, lse_b = flash_attention_with_lse(q_hi, k_lo, v_lo, causal=False,
                                          scale=scale)
    o_hi, lse_hi = _merge_lse(o_hi, lse_hi, o_b, lse_b)

    # ---- ring steps: two entirely-past half-chunk blocks each ----------
    ring = [(i, (i + 1) % n) for i in range(n)]
    for step in range(1, n):
        k_lo = jax.lax.ppermute(k_lo, axis_name, ring)
        v_lo = jax.lax.ppermute(v_lo, axis_name, ring)
        k_hi = jax.lax.ppermute(k_hi, axis_name, ring)
        v_hi = jax.lax.ppermute(v_hi, axis_name, ring)
        src = (d - step) % n  # arriving chunks: (src, 2n-1-src)

        # always-past: q chunk (2n-1-d) vs k chunk src
        o_b, lse_b = flash_attention_with_lse(q_hi, k_lo, v_lo,
                                              causal=False, scale=scale)
        o_hi, lse_hi = _merge_lse(o_hi, lse_hi, o_b, lse_b)

        # exactly one of the remaining pairs is past:
        #   d > src:  (q chunk d)      vs (k chunk src)       -> lo acc
        #   d < src:  (q chunk 2n-1-d) vs (k chunk 2n-1-src)  -> hi acc
        cond = (d > src)[None, None, None, None]
        q_s = jnp.where(cond, q_lo, q_hi)
        k_s = jnp.where(cond, k_lo, k_hi)
        v_s = jnp.where(cond, v_lo, v_hi)
        o_b, lse_b = flash_attention_with_lse(q_s, k_s, v_s, causal=False,
                                              scale=scale)
        m_lo, ml_lo = _merge_lse(o_lo, lse_lo, o_b, lse_b)
        m_hi, ml_hi = _merge_lse(o_hi, lse_hi, o_b, lse_b)
        o_lo = jnp.where(cond, m_lo, o_lo)
        lse_lo = jnp.where(cond, ml_lo, lse_lo)
        o_hi = jnp.where(cond, o_hi, m_hi)
        lse_hi = jnp.where(cond, lse_hi, ml_hi)

    # ---- zigzag -> contiguous ------------------------------------------
    # target t's front chunk (2t) comes from owner(2t) — inverse perms
    perm_front = [(owner(2 * t), t) for t in range(n)]
    perm_back = [(owner(2 * t + 1), t) for t in range(n)]
    # device j's lo is chunk j: front of block j//2 when j even; its hi
    # (chunk 2n-1-j, odd id) is the back of a block when j even.
    send_front = jnp.where(is_even, o_lo, o_hi)
    send_back = jnp.where(is_even, o_hi, o_lo)
    front = jax.lax.ppermute(send_front, axis_name, perm_front)
    back = jax.lax.ppermute(send_back, axis_name, perm_back)
    return jnp.concatenate([front, back], axis=2).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = True,
    scale: float | None = None,
    axis_name: str = AXIS_CONTEXT,
    schedule: str = "auto",
) -> jnp.ndarray:
    """Full (or causal) attention over (B, H, S_global, D) with the
    sequence dimension sharded over ``axis_name``.

    S_global must be divisible by the axis size. Output has the same
    sharding as ``q``.

    ``schedule``: "ring" | "zigzag" | "auto". Zigzag is the load-balanced
    causal schedule (uniform work per device, no computed-and-killed
    blocks); "auto" picks it whenever it applies (causal, local shard
    length divisible into two 8-aligned halves).
    """
    num_shards = mesh.shape[axis_name]
    if q.shape[2] % num_shards:
        raise ValueError(
            f"sequence {q.shape[2]} not divisible by {num_shards} shards"
        )
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    s_local = q.shape[2] // num_shards
    if schedule == "auto":
        schedule = (
            "zigzag" if causal and num_shards > 1 and s_local % 16 == 0
            else "ring"
        )
    if schedule == "zigzag" and not causal:
        raise ValueError("zigzag schedule is causal-only")

    # Batch stays sharded over ``data`` so ring attention composes with DP
    # (a None batch spec would silently all-gather the batch).
    batch_axis = AXIS_DATA if AXIS_DATA in mesh.shape else None
    spec = P(batch_axis, None, axis_name, None)
    if schedule == "zigzag":
        body = functools.partial(
            _zigzag_body,
            axis_name=axis_name,
            num_shards=num_shards,
            scale=float(scale),
        )
    else:
        body = functools.partial(
            _ring_body,
            axis_name=axis_name,
            num_shards=num_shards,
            scale=float(scale),
            causal=causal,
        )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
