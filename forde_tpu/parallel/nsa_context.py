"""Context parallelism for Native Sparse Attention (the flagship config).

The reference's NSA is single-device (src/forde/sparse_attention.py); ring
attention (parallel/ring_attention.py) scales only the dense-causal
fallback. This module shards the FULL NSA semantics over the ``context``
mesh axis with structure-aware collectives — far cheaper than a ring,
because each NSA branch needs only a bounded slice of remote state:

  * local (sliding window W):   one ``ppermute`` of the previous shard's
    last W-1 K/V rows (the halo) + an O(W^2) boundary-corner attention,
    merged into the local window attention via differentiable
    log-sum-exp. Comms O(W), not O(S).
  * compressed (pooled global): pool means are computed shard-locally and
    ``all_gather``ed — comms O(S/ratio).
  * top-k (global selection):   scores all_gather (O(S) scalars), global
    top-k computed replicated, selected rows fetched with a masked
    gather + ``psum`` — comms O(k·D).

Every piece is differentiable (the flash kernels' lse cotangent folds
into their backward; ppermute/psum transpose to themselves), so the whole
NSA training step runs under context parallelism. Equivalence vs the
single-device path is tested on the CPU mesh
(tests/test_parallel_wiring.py) and exercised by dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_CONTEXT, AXIS_DATA

NEG_INF = -1e30


def context_shards(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return mesh.shape.get(AXIS_CONTEXT, 1)


def _batch_axis(mesh: Mesh):
    return AXIS_DATA if AXIS_DATA in mesh.shape else None


def _merge_lse(o_a, lse_a, o_b, lse_b):
    """Exact softmax merge of two partials over disjoint key sets."""
    m = jnp.maximum(lse_a, lse_b)
    w_a = jnp.exp(lse_a - m)
    w_b = jnp.exp(lse_b - m)
    denom = w_a + w_b
    return (o_a.astype(jnp.float32) * w_a + o_b.astype(jnp.float32) * w_b) / denom


def _window_body(q, k, v, *, axis_name, num_shards, window, impl):
    """Per-shard sliding-window attention with a halo corner merge.

    Local query g = base + i must see global keys [g-W+1, g]. The local
    square window kernel covers keys >= base; the remainder lives in the
    previous shard's last H = W-1 rows. For those halo keys (global
    base - H + j, j in [0, H)) visibility to local query i reduces to
    j >= i — an UPPER-triangular mask, i.e. causal attention in flipped
    coordinates, so the same flash kernel computes the corner after a
    seq-axis flip (padded by one row to keep S 8-aligned).
    """
    from forde_tpu.ops.flash_attention import flash_attention_with_lse

    idx = jax.lax.axis_index(axis_name)
    halo = window - 1

    o_loc, lse_loc = flash_attention_with_lse(
        q, k, v, causal=True, window_size=window, impl=impl
    )

    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    k_halo = jax.lax.ppermute(k[:, :, -halo:, :], axis_name, perm)
    v_halo = jax.lax.ppermute(v[:, :, -halo:, :], axis_name, perm)

    # corner: first `halo` local queries vs the halo keys, flipped causal.
    q_head = q[:, :, :halo, :]
    pad = [(0, 0), (0, 0), (0, 1), (0, 0)]  # halo = W-1 -> 8-aligned W
    qf = jnp.pad(q_head[:, :, ::-1, :], pad)
    kf = jnp.pad(k_halo[:, :, ::-1, :], pad)
    vf = jnp.pad(v_halo[:, :, ::-1, :], pad)
    o_x, lse_x = flash_attention_with_lse(qf, kf, vf, causal=True, impl=impl)
    o_x = o_x[:, :, :halo][:, :, ::-1]
    lse_x = lse_x[:, :, :halo][:, :, ::-1]

    # shard 0 has no previous shard: kill the corner in the merge.
    lse_x = jnp.where(idx == 0, NEG_INF, lse_x)
    o_head = _merge_lse(o_loc[:, :, :halo], lse_loc[:, :, :halo], o_x, lse_x)
    return jnp.concatenate(
        [o_head.astype(q.dtype), o_loc[:, :, halo:]], axis=2
    )


def window_attention_cp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    window: int,
    *,
    impl: str = "auto",
    axis_name: str = AXIS_CONTEXT,
) -> jnp.ndarray:
    """Causal sliding-window attention over (B, H, S_global, D) with the
    sequence sharded on ``axis_name``. Requires S_local >= window - 1
    (the window spans at most one shard boundary)."""
    n = mesh.shape[axis_name]
    b, h, s, d = q.shape
    if s % n:
        raise ValueError(f"sequence {s} not divisible by {n} context shards")
    s_local = s // n
    if s_local < window - 1:
        raise ValueError(
            f"context parallelism needs S/shards >= window-1 "
            f"(got {s_local} < {window - 1}); use fewer context shards"
        )
    spec = P(_batch_axis(mesh), None, axis_name, None)
    fn = jax.shard_map(
        functools.partial(
            _window_body,
            axis_name=axis_name,
            num_shards=n,
            window=window,
            impl=impl,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def gather_pool_means_cp(
    x: jnp.ndarray,
    mesh: Mesh,
    ratio: int,
    num_pools: int,
    *,
    axis_name: str = AXIS_CONTEXT,
) -> jnp.ndarray:
    """Pool means of ratio-sized chunks of (B, S_global, D), computed
    shard-locally and all-gathered (replicated on the context axis).

    Matches the single-device compressed branch exactly when
    num_pools * ratio <= S (always true for S > window + ratio, the regime
    where the compressed gate is on): chunk boundaries align with shard
    boundaries because S_local % ratio == 0 is required."""
    n = mesh.shape[axis_name]
    b, s, d = x.shape
    s_local = s // n
    if s_local % ratio:
        raise ValueError(
            f"S/shards={s_local} must be divisible by compression_ratio={ratio}"
        )

    def body(x_loc):
        return x_loc.reshape(
            x_loc.shape[0], s_local // ratio, ratio, d
        ).mean(axis=2)

    # out_specs reassembles the global pooled sequence (still context-
    # sharded); XLA inserts the all-gather where a consumer needs it
    # replicated. Gathering by hand trips the shard_map VMA check
    # (all_gather output is not statically known replicated).
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P(_batch_axis(mesh), axis_name, None),
        out_specs=P(_batch_axis(mesh), axis_name, None),
    )
    return fn(x)[:, :num_pools]


def topk_select_cp(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = AXIS_CONTEXT,
) -> jnp.ndarray:
    """Gather rows ``idx`` (B, K) global indices from context-sharded
    (B, S_global, D) without materializing the full sequence anywhere:
    each shard contributes its in-range rows, summed with ``psum``."""
    n = mesh.shape[axis_name]
    b, s, d = x.shape
    s_local = s // n

    def body(x_loc, idx_rep):
        base = jax.lax.axis_index(axis_name) * s_local
        loc = idx_rep - base
        valid = (loc >= 0) & (loc < s_local)
        rows = jnp.take_along_axis(
            x_loc, jnp.clip(loc, 0, s_local - 1)[..., None], axis=1
        )
        rows = jnp.where(valid[..., None], rows, jnp.zeros_like(rows))
        return jax.lax.psum(rows, axis_name)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(_batch_axis(mesh), axis_name, None), P(_batch_axis(mesh), None)),
        out_specs=P(_batch_axis(mesh), None, None),
    )
    return fn(x, idx)


def small_kv_attention_cp(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_pos: jnp.ndarray,
    mesh: Mesh,
    *,
    impl: str = "auto",
    axis_name: str = AXIS_CONTEXT,
) -> jnp.ndarray:
    """small_kv_attention with (B, H, S_global, D) queries context-sharded
    and the small key set replicated: per-key visibility thresholds are
    global positions, so each shard shifts them by its base offset."""
    n = mesh.shape[axis_name]
    s_local = q.shape[2] // n

    def body(q_loc, k_rep, v_rep, pos_rep):
        from forde_tpu.ops.nsa_attention import small_kv_attention

        base = jax.lax.axis_index(axis_name) * s_local
        return small_kv_attention(
            q_loc, k_rep, v_rep, pos_rep - base, impl=impl
        )

    qspec = P(_batch_axis(mesh), None, axis_name, None)
    kspec = P(_batch_axis(mesh), None, None, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(qspec, kspec, kspec, P(_batch_axis(mesh), None)),
        out_specs=qspec,
    )
    return fn(q, k, v, key_pos)
