"""Fused kernel for the NSA compressed-global and top-k branches.

Both branches (reference src/forde/sparse_attention.py:367-480) are
attention of every query against a SMALL key set (S/ratio pool summaries,
or top_k_global selected tokens) with a per-key position threshold:

    mask[b, q, j] = q >= key_pos[b, j]          (else score = -1e9)

The reference — and round-1's port (nn/attention.py) — materialize the
(B, H, S, K) fp32 score tensor in HBM. Here the whole key set lives in
VMEM (K is 64..few hundred), so each q-block computes scores, softmax and
the output matmul in one VMEM pass; scores never touch HBM. The backward
recomputes scores per block (flash-style) and accumulates dk/dv across
q blocks in VMEM.

Reference quirk preserved: masked scores are -1e9, NOT -inf, so a query
with no unmasked key gets a UNIFORM distribution over the (real) keys
(sparse_attention.py:417-421) — only padding keys use -inf.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_BIG = -1e9  # reference masking constant (NOT -inf; see module docstring)
# A key whose threshold is >= INVALID_KEY_POS can never become visible
# (no query position reaches 2**30), so it is treated as PADDING: masked
# with -inf, not -1e9 — it is excluded even from the reference's
# uniform-distribution quirk. The ragged NSA prefill uses this to hide
# pools that do not exist at a row's true length (models/generate.
# nsa_prefill with ``lengths``).
INVALID_KEY_POS = 2**30
DEFAULT_BLOCK_Q = 1024
# impl="auto" picks the kernel only when the materialized (S, K) score
# tensor is big enough for HBM traffic to dominate. Measured on v5e
# (fwd+bwd, bf16, B=4 H=8 D=64): S=2048/K<=192 is a wash vs XLA's fused
# reference (1.7ms both — XLA fuses mask+softmax into the small matmuls
# well); S=8192/P=960 kernel wins 2.2x (12.0 -> 5.5ms); S=16384/P=1984
# wins 2.2x (45.2 -> 20.9ms).
AUTO_PALLAS_MIN_SCORE_ELEMS = 2 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dot(a, b, dims):
    """fp32-accumulating matmul; pins DEFAULT precision for bf16 operands
    so the ambient jax_default_matmul_precision="highest" cannot force an
    un-lowerable fp32 contract onto the MXU (Mosaic "Bad lhs type")."""
    prec = None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )



def small_kv_attention_ref(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_pos: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """jnp reference: exactly the reference's masked-softmax math
    (sparse_attention.py:407-427 / :462-477)."""
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    q_pos = jnp.arange(q.shape[2])[None, None, :, None]
    k_pos = key_pos[:, None, None, :]
    scores = jnp.where(q_pos >= k_pos, scores, NEG_BIG)
    scores = jnp.where(k_pos >= INVALID_KEY_POS, -jnp.inf, scores)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _scores(q, k, pos_row, qi, block_q, k_real, scale):
    """(bq, K) masked fp32 scores for one q block; shared by fwd and bwd.

    ``pos_row`` is (1, K) — it broadcasts against the (bq, K) score block.
    """
    bq = q.shape[0]
    kp = k.shape[0]
    s = _dot(q, k, ((1,), (1,))) * scale
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, kp), 0)
    mask = q_pos >= pos_row
    s = jnp.where(mask, s, NEG_BIG)
    # threshold >= INVALID_KEY_POS: padding key — absolute exclusion
    # (-inf), outside even the uniform-distribution quirk. ``mask`` is
    # already False there (no q_pos reaches 2**30).
    s = jnp.where(pos_row >= INVALID_KEY_POS, -jnp.inf, s)
    if kp != k_real:  # static padding of the key axis: exclude absolutely
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, kp), 1)
        s = jnp.where(col < k_real, s, -jnp.inf)
        mask = mask & (col < k_real)
    return s, mask


def _fwd_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_q, k_real):
    qi = pl.program_id(1)
    s, _ = _scores(q_ref[0], k_ref[0], pos_ref[0], qi, block_q, k_real, scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = _dot(w.astype(v_ref.dtype), v_ref[0], ((1,), (0,))).astype(
        o_ref.dtype
    )


def _bwd_kernel(
    pos_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, block_q, k_real,
):
    qi = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    s, mask = _scores(q, k, pos_ref[0], qi, block_q, k_real, scale)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)  # (bq, K) fp32

    do = do_ref[0]  # input dtype: both matmul operands stay native
    # dv: w^T @ do, accumulated over q blocks
    dv_blk = _dot(w.astype(do.dtype), do, ((0,), (0,)))
    # dw = do @ v^T ; ds = softmax backward, zeroed where the mask zeroed
    # the forward dependence on s (jnp.where has zero gradient there).
    dw = _dot(do_ref[0], v_ref[0], ((1,), (1,)))
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale
    dq_ref[0] = _dot(ds.astype(k.dtype), k, ((1,), (0,))).astype(
        dq_ref.dtype
    )
    dk_blk = _dot(ds.astype(q.dtype), q, ((0,), (0,)))

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_blk
    dv_ref[0] += dv_blk


def _pad_inputs(q, k, v, key_pos, block_q):
    b, h, s, d = q.shape
    kk = k.shape[2]
    s_pad = _ceil_to(s, block_q)
    k_pad = _ceil_to(kk, 8)
    d_pad = max(_ceil_to(d, 64), 64)
    if s_pad != s or d_pad != d:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)])
    if k_pad != kk or d_pad != d:
        k = jnp.pad(k, [(0, 0), (0, 0), (0, k_pad - kk), (0, d_pad - d)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, k_pad - kk), (0, d_pad - d)])
        key_pos = jnp.pad(key_pos, [(0, 0), (0, k_pad - kk)])
    return q, k, v, key_pos


def _fwd_pallas(q, k, v, key_pos, scale, block_q, k_real, interpret):
    b, h, s_pad, d = q.shape
    kp = k.shape[2]
    bh = b * h
    q2 = q.reshape(bh, s_pad, d)
    k2 = k.reshape(bh, kp, d)
    v2 = v.reshape(bh, kp, d)
    # (bh, 1, kp): TPU block tiling requires the LAST TWO block dims to
    # divide (8, 128) or equal the array dims — (1, kp) blocks of a
    # (bh, kp) array violate the sublane rule; (1, 1, kp) of (bh, 1, kp)
    # is exact.
    pos2 = jnp.broadcast_to(key_pos[:, None, None, :], (b, h, 1, kp))
    pos2 = pos2.reshape(bh, 1, kp)
    grid = (bh, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, block_q=block_q, k_real=k_real
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, kp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(pos2, q2, k2, v2)
    return out.reshape(b, h, s_pad, d)


def _bwd_pallas(q, k, v, key_pos, do, scale, block_q, k_real, interpret):
    b, h, s_pad, d = q.shape
    kp = k.shape[2]
    bh = b * h
    q2 = q.reshape(bh, s_pad, d)
    k2 = k.reshape(bh, kp, d)
    v2 = v.reshape(bh, kp, d)
    do2 = do.reshape(bh, s_pad, d)
    pos2 = jnp.broadcast_to(key_pos[:, None, None, :], (b, h, 1, kp))
    pos2 = pos2.reshape(bh, 1, kp)
    grid = (bh, s_pad // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, block_q=block_q, k_real=k_real
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, kp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, kp, d), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, kp, d), jnp.float32),
        ],
        interpret=interpret,
    )(pos2, q2, k2, v2, do2)
    return (
        dq.reshape(b, h, s_pad, d),
        dk.reshape(b, h, kp, d),
        dv.reshape(b, h, kp, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _small_kv_pallas(q, k, v, key_pos, scale, block_q, interpret):
    out, _ = _small_kv_fwd(q, k, v, key_pos, scale, block_q, interpret)
    return out


def _small_kv_fwd(q, k, v, key_pos, scale, block_q, interpret):
    s, d, k_real = q.shape[2], q.shape[3], k.shape[2]
    qp, kp_, vp, posp = _pad_inputs(q, k, v, key_pos, block_q)
    out = _fwd_pallas(qp, kp_, vp, posp, scale, block_q, k_real, interpret)
    return out[:, :, :s, :d], (q, k, v, key_pos)


def _small_kv_bwd(scale, block_q, interpret, res, do):
    q, k, v, key_pos = res
    s, d, k_real = q.shape[2], q.shape[3], k.shape[2]
    qp, kp_, vp, posp = _pad_inputs(q, k, v, key_pos, block_q)
    s_pad, d_pad = qp.shape[2], qp.shape[3]
    if do.shape[2] != s_pad or do.shape[3] != d_pad:
        do = jnp.pad(
            do, [(0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)]
        )
    dq, dk, dv = _bwd_pallas(
        qp, kp_, vp, posp, do, scale, block_q, k_real, interpret
    )
    dkp = np.zeros(key_pos.shape, dtype=jax.dtypes.float0)
    return (
        dq[:, :, :s, :d].astype(q.dtype),
        dk[:, :, :k_real, :d].astype(k.dtype),
        dv[:, :, :k_real, :d].astype(v.dtype),
        dkp,
    )


_small_kv_pallas.defvjp(_small_kv_fwd, _small_kv_bwd)


def small_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_pos: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: int = DEFAULT_BLOCK_Q,
) -> jnp.ndarray:
    """Attention of (B, H, S, D) queries against a small key set
    (B, H, K, D) with per-key causal thresholds ``key_pos`` (B, K) int32:
    key j is visible to query position p iff p >= key_pos[b, j].

    Serves both NSA global branches: compressed (key_pos = pool end
    positions) and top-k (key_pos = selected token indices). ``impl`` as in
    flash_attention: "auto" | "pallas" | "interpret" | "reference".
    """
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    if impl == "auto":
        big = q.shape[2] * k.shape[2] >= AUTO_PALLAS_MIN_SCORE_ELEMS
        impl = (
            "pallas"
            if (jax.default_backend() == "tpu" and big)
            else "reference"
        )
    if impl == "reference":
        return small_kv_attention_ref(q, k, v, key_pos, scale=scale)
    s = q.shape[2]
    block_q = min(block_q, _ceil_to(s, 8))
    # VMEM clamp: the backward holds ~6 (block_q, K) fp32 temporaries
    # (scores, mask, p, w, dw, ds) — keep them well under the 16MB scoped
    # limit.
    kp = _ceil_to(k.shape[2], 8)
    budget_rows = (10 * 1024 * 1024) // (kp * 4 * 6)
    block_q = max(min(block_q, budget_rows // 8 * 8), 8)
    return _small_kv_pallas(
        q, k, v, key_pos.astype(jnp.int32), float(scale), block_q,
        impl == "interpret",
    )
