"""Pallas TPU flash attention: causal and sliding-window, forward + backward.

This is the TPU-native replacement for the reference's O(S^2)-materialized
masked attention (src/forde/sparse_attention.py:84-96 computes the full
(B, H, S, S) score tensor even for the sliding-window branch). Here scores
are never materialized: the forward pass is an online-softmax kernel over
key blocks; the backward pass is two kernels (dq, and dk/dv) using the saved
log-sum-exp, the standard flash-attention-2 decomposition.

Mask semantics match the reference exactly (equivalence-tested against
``attention_ref``): causal = ``q_pos >= k_pos``; sliding window =
``0 <= q_pos - k_pos < window_size`` (src/forde/sparse_attention.py:27-48).

The jnp reference path in ``attention_ref`` is used off-TPU (tests run on a
CPU mesh) and as ground truth.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from jax.experimental.pallas import tpu as pltpu

from forde_tpu.ops import attention_ref

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
MASK_VALUE = -1e30


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, dims):
    """fp32-accumulating matmul that keeps bf16 operands on the MXU fast
    path. The ambient jax_default_matmul_precision (tests set "highest")
    would force fp32 contract precision onto bf16 operands, which Mosaic
    cannot lower ("Bad lhs type") — pin DEFAULT for sub-fp32 dtypes."""
    prec = None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _loop_bounds(row_start, rows, block_c, n_cblocks, window, causal, kv_len):
    """[start, end) of column blocks a row block touches, plus the interior
    sub-range [fs, fe) in which EVERY (row, col) pair satisfies the mask —
    interior iterations skip the iota/compare/select work entirely. At
    D=64 the per-block VPU mask cost is comparable to the MXU matmuls, so
    this ~halves interior-block cost (benchmarks/flash_sweep.py).

    Rows/cols are q/k for the fwd+dq kernels. Bounds may be traced ints.
    """
    if kv_len is not None:
        n_cblocks = pl.cdiv(kv_len, block_c)
    if causal:
        j_end = jax.lax.div(row_start + rows - 1, block_c) + 1
    else:
        j_end = n_cblocks
    if window is not None:
        j_start = jnp.maximum(0, jax.lax.div(row_start - window + 1, block_c))
    else:
        j_start = 0

    # Interior conditions (all pairs unmasked), col block j starting at
    # cs = j*block_c:
    #   causal  all-true iff cs + block_c - 1 <= row_start
    #   window  all-true iff (row_start + rows - 1) - cs <  window
    #   kv_len  all-true iff cs + block_c <= kv_len
    fs, fe = j_start, j_end
    if window is not None:
        fs = jnp.maximum(
            fs, -jnp.floor_divide(-(row_start + rows - window), block_c)
        )
    if causal:
        fe = jnp.minimum(
            fe, jnp.floor_divide(row_start - block_c + 1, block_c) + 1
        )
    if kv_len is not None:
        fe = jnp.minimum(fe, kv_len // block_c)
    fs = jnp.clip(fs, j_start, j_end)
    fe = jnp.clip(fe, fs, j_end)
    return j_start, j_end, fs, fe


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_q, block_k, window, causal,
    kv_len,
):
    qi = pl.program_id(2)
    q_start = qi * block_q
    # Matmul operands stay in the INPUT dtype: bf16 x bf16 -> fp32 is the
    # MXU fast path (fp32 operands run multi-pass at a fraction of the
    # rate); softmax statistics and the accumulator remain fp32.
    q = q_ref[0, 0]  # (block_q, D)
    seq_k = k_ref.shape[2]
    j_start, j_end, fs, fe = _loop_bounds(
        q_start, block_q, block_k, seq_k // block_k, window, causal, kv_len
    )
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def make_body(masked):
        def body(j, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
            v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
            s = _dot(q, k, ((1,), (1,))) * scale  # (block_q, block_k) fp32
            if masked:
                diff = (q_start + q_iota) - (j * block_k + k_iota)
                mask = jnp.ones_like(s, dtype=jnp.bool_)
                if causal:
                    mask = mask & (diff >= 0)
                if window is not None:
                    mask = mask & (diff < window)
                if kv_len is not None:
                    mask = mask & (j * block_k + k_iota < kv_len)
                s = jnp.where(mask, s, MASK_VALUE)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + _dot(p.astype(v.dtype), v, ((1,), (0,)))
            return m_new, l_new, acc

        return body

    d = q.shape[-1]
    carry = (
        jnp.full((block_q, 1), MASK_VALUE, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
        jnp.zeros((block_q, d), jnp.float32),
    )
    masked_body, inner_body = make_body(True), make_body(False)
    carry = jax.lax.fori_loop(j_start, fs, masked_body, carry)
    carry = jax.lax.fori_loop(fs, fe, inner_body, carry)
    m, l, acc = jax.lax.fori_loop(fe, j_end, masked_body, carry)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    # lse is carried as (B, H, S, 1): the trailing singleton keeps the block
    # tile (block_q, 1) legal on TPU (sublane divisible by 8, lane == full).
    lse_ref[0, 0] = (m + jnp.log(l_safe)).astype(jnp.float32)


def _fwd_pallas(q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len):
    b, h, s, d = q.shape
    grid = (b, h, s // block_q)
    # Keep K/V in VMEM for the whole (b, h) program; blocks are streamed from
    # there by the fori_loop.
    kv_spec = pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
    ]
    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        window=window,
        causal=causal,
        kv_len=kv_len,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, block_q, block_k, window, causal, kv_len,
):
    qi = pl.program_id(2)
    q_start = qi * block_q
    q = q_ref[0, 0]  # input dtype: keep MXU on the bf16 fast path
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]  # (block_q, 1)
    delta = delta_ref[0, 0]
    seq_k = k_ref.shape[2]
    j_start, j_end, fs, fe = _loop_bounds(
        q_start, block_q, block_k, seq_k // block_k, window, causal, kv_len
    )
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def make_body(masked):
        def body(j, dq):
            k = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
            v = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
            s = _dot(q, k, ((1,), (1,))) * scale
            p = jnp.exp(s - lse)
            if masked:
                diff = (q_start + q_iota) - (j * block_k + k_iota)
                mask = jnp.ones_like(s, dtype=jnp.bool_)
                if causal:
                    mask = mask & (diff >= 0)
                if window is not None:
                    mask = mask & (diff < window)
                if kv_len is not None:
                    mask = mask & (j * block_k + k_iota < kv_len)
                p = jnp.where(mask, p, 0.0)
            dp = _dot(do, v, ((1,), (1,)))
            ds = p * (dp - delta) * scale
            dq = dq + _dot(ds.astype(k.dtype), k, ((1,), (0,)))
            return dq

        return body

    d = q.shape[-1]
    dq = jnp.zeros((block_q, d), jnp.float32)
    masked_body, inner_body = make_body(True), make_body(False)
    dq = jax.lax.fori_loop(j_start, fs, masked_body, dq)
    dq = jax.lax.fori_loop(fs, fe, inner_body, dq)
    dq = jax.lax.fori_loop(fe, j_end, masked_body, dq)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, block_q, block_k, window, causal, kv_len,
):
    ki = pl.program_id(2)
    k_start = ki * block_k
    k = k_ref[0, 0]  # (block_k, D), input dtype (MXU bf16 fast path)
    v = v_ref[0, 0]
    seq_q = q_ref.shape[2]
    n_qblocks = seq_q // block_q

    if causal:
        i_start = jax.lax.div(k_start, block_q)
    else:
        i_start = 0
    if window is not None:
        i_end = jnp.minimum(
            n_qblocks, jax.lax.div(k_start + block_k - 1 + window - 1, block_q) + 1
        )
    else:
        i_end = n_qblocks

    # Interior sub-range [fs, fe): q blocks where every pair is unmasked
    # (mirror of _loop_bounds with the q/k roles swapped).
    fs, fe = i_start, i_end
    if causal:
        fs = jnp.maximum(
            fs, -jnp.floor_divide(-(k_start + block_k - 1), block_q)
        )
    if window is not None:
        fe = jnp.minimum(
            fe, jnp.floor_divide(k_start + window - block_q, block_q) + 1
        )
    if kv_len is not None:
        # k-block partially beyond kv_len -> no interior at all
        fe = jnp.where(k_start + block_k <= kv_len, fe, fs)
    fs = jnp.clip(fs, i_start, i_end)
    fe = jnp.clip(fe, fs, i_end)

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def make_body(masked):
        def body(i, carry):
            dk, dv = carry
            q = q_ref[0, 0, pl.ds(i * block_q, block_q), :]
            do = do_ref[0, 0, pl.ds(i * block_q, block_q), :]
            lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :]  # (block_q, 1)
            delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :]
            s = _dot(q, k, ((1,), (1,))) * scale  # (block_q, block_k)
            p = jnp.exp(s - lse)
            if masked:
                diff = (i * block_q + q_iota) - k_pos
                mask = jnp.ones_like(s, dtype=jnp.bool_)
                if causal:
                    mask = mask & (diff >= 0)
                if window is not None:
                    mask = mask & (diff < window)
                if kv_len is not None:
                    mask = mask & (k_pos < kv_len)
                p = jnp.where(mask, p, 0.0)
            dv = dv + _dot(p.astype(do.dtype), do, ((0,), (0,)))
            dp = _dot(do, v, ((1,), (1,)))
            ds = p * (dp - delta) * scale
            dk = dk + _dot(ds.astype(q.dtype), q, ((0,), (0,)))
            return dk, dv

        return body

    d = k.shape[-1]
    carry = (
        jnp.zeros((block_k, d), jnp.float32),
        jnp.zeros((block_k, d), jnp.float32),
    )
    masked_body, inner_body = make_body(True), make_body(False)
    carry = jax.lax.fori_loop(i_start, fs, masked_body, carry)
    carry = jax.lax.fori_loop(fs, fe, inner_body, carry)
    dk, dv = jax.lax.fori_loop(fe, i_end, masked_body, carry)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_pallas(
    q, k, v, o, lse, do, scale, window, causal, block_q, block_k, interpret,
    kv_len, dlse=None,
):
    b, h, s, d = q.shape
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, H, S, 1)
    if dlse is not None:
        # lse cotangent: dL/ds_ij gains + dlse_i * p_ij (d lse/d s = p),
        # which folds into the kernels' ds = p*(dp - delta) as delta-dlse.
        delta = delta - dlse.astype(jnp.float32)

    full_spec = pl.BlockSpec((1, 1, s, d), lambda bi, hi, xi: (bi, hi, 0, 0))
    full_vec = pl.BlockSpec((1, 1, s, 1), lambda bi, hi, xi: (bi, hi, 0, 0))

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            window=window, causal=causal, kv_len=kv_len,
        ),
        grid=(b, h, s // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            full_spec,
            full_spec,
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            window=window, causal=causal, kv_len=kv_len,
        ),
        grid=(b, h, s // block_k),
        in_specs=[
            full_spec,
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            full_spec,
            full_vec,
            full_vec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Streaming long-context kernels (S > LONG_SEQ_THRESHOLD)
# ---------------------------------------------------------------------------
#
# The kernels above keep full-S arrays resident in VMEM (K/V in the
# forward, q/do in dk/dv) — the fast layout up to S=4096, but ~20MB of
# scoped vmem at S=8192 (hard 16MB limit). These variants stream instead:
# the grid gains an inner axis over the relevant opposite-side blocks, the
# online-softmax / gradient accumulators live in VMEM scratch across that
# axis, and for the sliding-window case the BlockSpec index map walks only
# the ~window/block blocks each row block can touch (block-sparse DMA, not
# just block-sparse compute). No full-S array ever sits in VMEM, so S is
# unbounded. kv_len is not supported here (that path is short-S only).

LONG_SEQ_THRESHOLD = 4096


def _stream_span(window, causal, block_q, block_k, n_kblocks):
    """Inner-axis length + k-block index base for a q block."""
    if window is not None:
        n_w = (window + block_q) // block_k + 1

        def base(qi):  # first k block the q block can touch
            return jnp.maximum(
                0, jax.lax.div(qi * block_q - window + 1, block_k)
            )

        return n_w, base
    # causal-full / unmasked: dense inner axis from block 0
    return n_kblocks, lambda qi: 0


def _fwd_stream_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_sc, l_sc, acc_sc,
    *, scale, block_q, block_k, window, causal, n_kblocks, n_w,
):
    qi, wi = pl.program_id(2), pl.program_id(3)
    q_start = qi * block_q
    _, base = _stream_span(window, causal, block_q, block_k, n_kblocks)
    ki = base(qi) + wi

    @pl.when(wi == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, MASK_VALUE)
        l_sc[...] = jnp.zeros_like(l_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    if causal:
        j_end = jax.lax.div(q_start + block_q - 1, block_k) + 1
    else:
        j_end = n_kblocks
    active = (ki < j_end) & (ki < n_kblocks)

    @pl.when(active)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = _dot(q, k, ((1,), (1,))) * scale
        diff = (
            q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ) - (ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        mask = jnp.ones_like(s, dtype=jnp.bool_)
        if causal:
            mask = mask & (diff >= 0)
        if window is not None:
            mask = mask & (diff < window)
        s = jnp.where(mask, s, MASK_VALUE)
        m_prev, l_prev, acc = m_sc[...], l_sc[...], acc_sc[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        m_sc[...] = m_new
        l_sc[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_sc[...] = acc * alpha + _dot(p.astype(v.dtype), v, ((1,), (0,)))

    @pl.when(wi == n_w - 1)
    def _():
        l = l_sc[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_sc[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0] = m_sc[...] + jnp.log(l_safe)


def _bwd_dq_stream_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_sc,
    *, scale, block_q, block_k, window, causal, n_kblocks, n_w,
):
    qi, wi = pl.program_id(2), pl.program_id(3)
    q_start = qi * block_q
    _, base = _stream_span(window, causal, block_q, block_k, n_kblocks)
    ki = base(qi) + wi

    @pl.when(wi == 0)
    def _():
        dq_sc[...] = jnp.zeros_like(dq_sc)

    if causal:
        j_end = jax.lax.div(q_start + block_q - 1, block_k) + 1
    else:
        j_end = n_kblocks
    active = (ki < j_end) & (ki < n_kblocks)

    @pl.when(active)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        s = _dot(q, k, ((1,), (1,))) * scale
        p = jnp.exp(s - lse)
        diff = (
            q_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ) - (ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        mask = jnp.ones_like(s, dtype=jnp.bool_)
        if causal:
            mask = mask & (diff >= 0)
        if window is not None:
            mask = mask & (diff < window)
        p = jnp.where(mask, p, 0.0)
        dp = _dot(do, v, ((1,), (1,)))
        ds = p * (dp - delta) * scale
        dq_sc[...] = dq_sc[...] + _dot(ds.astype(k.dtype), k, ((1,), (0,)))

    @pl.when(wi == n_w - 1)
    def _():
        dq_ref[0, 0] = dq_sc[...].astype(dq_ref.dtype)


def _bwd_dkv_stream_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_sc, dv_sc,
    *, scale, block_q, block_k, window, causal, n_qblocks, n_wq,
):
    ki, wi = pl.program_id(2), pl.program_id(3)
    k_start = ki * block_k
    qi = jax.lax.div(k_start, block_q) + wi  # causal: q starts at the diagonal

    @pl.when(wi == 0)
    def _():
        dk_sc[...] = jnp.zeros_like(dk_sc)
        dv_sc[...] = jnp.zeros_like(dv_sc)

    if window is not None:
        i_end = jnp.minimum(
            n_qblocks,
            jax.lax.div(k_start + block_k - 1 + window - 1, block_q) + 1,
        )
    else:
        i_end = n_qblocks
    active = (qi < i_end) & (qi < n_qblocks)

    @pl.when(active)
    def _():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        s = _dot(q, k, ((1,), (1,))) * scale
        p = jnp.exp(s - lse)
        diff = (
            qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        ) - (k_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
        mask = jnp.ones_like(s, dtype=jnp.bool_)
        if causal:
            mask = mask & (diff >= 0)
        if window is not None:
            mask = mask & (diff < window)
        p = jnp.where(mask, p, 0.0)
        dv_sc[...] = dv_sc[...] + _dot(p.astype(do.dtype), do, ((0,), (0,)))
        dp = _dot(do, v, ((1,), (1,)))
        ds = p * (dp - delta) * scale
        dk_sc[...] = dk_sc[...] + _dot(ds.astype(q.dtype), q, ((0,), (0,)))

    @pl.when(wi == n_wq - 1)
    def _():
        dk_ref[0, 0] = dk_sc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_sc[...].astype(dv_ref.dtype)


def _clip_block(idx, n_blocks):
    return jnp.clip(idx, 0, n_blocks - 1)


def _fwd_stream_pallas(
    q, k, v, scale, window, causal, block_q, block_k, interpret
):
    b, h, s, d = q.shape
    n_q, n_k = s // block_q, s // block_k
    n_w, base = _stream_span(window, causal, block_q, block_k, n_k)

    def kmap(bi, hi, qi, wi):
        return (bi, hi, _clip_block(base(qi) + wi, n_k), 0)

    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_stream_kernel, scale=scale, block_q=block_q,
            block_k=block_k, window=window, causal=causal, n_kblocks=n_k,
            n_w=n_w,
        ),
        grid=(b, h, n_q, n_w),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, wi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), kmap),
            pl.BlockSpec((1, 1, block_k, d), kmap),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, wi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, wi: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return o, lse


def _bwd_stream_pallas(
    q, k, v, o, lse, do, scale, window, causal, block_q, block_k, interpret,
    dlse=None,
):
    b, h, s, d = q.shape
    n_q, n_k = s // block_q, s // block_k
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)  # see _bwd_pallas
    n_w, base = _stream_span(window, causal, block_q, block_k, n_k)

    def kmap(bi, hi, qi, wi):
        return (bi, hi, _clip_block(base(qi) + wi, n_k), 0)

    qspec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, wi: (bi, hi, qi, 0))
    qvec = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, wi: (bi, hi, qi, 0))
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_stream_kernel, scale=scale, block_q=block_q,
            block_k=block_k, window=window, causal=causal, n_kblocks=n_k,
            n_w=n_w,
        ),
        grid=(b, h, n_q, n_w),
        in_specs=[
            qspec,
            pl.BlockSpec((1, 1, block_k, d), kmap),
            pl.BlockSpec((1, 1, block_k, d), kmap),
            qspec,
            qvec,
            qvec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # q blocks a k block can touch: starts at the diagonal (causal), spans
    # the window (or everything above the diagonal for causal-full).
    if window is not None:
        n_wq = (window + block_k) // block_q + 1
    else:
        n_wq = n_q

    def qmap(bi, hi, ki, wi):
        return (
            bi, hi,
            _clip_block(jax.lax.div(ki * block_k, block_q) + wi, n_q), 0,
        )

    def qvmap(bi, hi, ki, wi):
        return qmap(bi, hi, ki, wi)

    kspec = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, wi: (bi, hi, ki, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_stream_kernel, scale=scale, block_q=block_q,
            block_k=block_k, window=window, causal=causal, n_qblocks=n_q,
            n_wq=n_wq,
        ),
        grid=(b, h, n_k, n_wq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), qmap),
            kspec,
            kspec,
            pl.BlockSpec((1, 1, block_q, d), qmap),
            pl.BlockSpec((1, 1, block_q, 1), qvmap),
            pl.BlockSpec((1, 1, block_q, 1), qvmap),
        ],
        out_specs=[kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper with padding
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_attention_padded(
    q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
):
    return _flash_fwd(
        q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
    )[0]


def _use_streaming(s, causal, kv_len):
    # Resident kernels hold full-S arrays in VMEM — past the threshold
    # they exceed the 16MB scoped limit; the streaming kernels are
    # unbounded in S (causal configs only; non-causal 4D calls are
    # short-S fallbacks).
    return s > LONG_SEQ_THRESHOLD and causal and kv_len is None


def _flash_fwd(q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len):
    if _use_streaming(q.shape[2], causal, kv_len):
        o, lse = _fwd_stream_pallas(
            q, k, v, scale, window, causal, block_q, block_k, interpret
        )
    else:
        o, lse = _fwd_pallas(
            q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
        )
    return o, (q, k, v, o, lse)


def _flash_bwd(scale, window, causal, block_q, block_k, interpret, kv_len, res, do):
    q, k, v, o, lse = res
    if _use_streaming(q.shape[2], causal, kv_len):
        dq, dk, dv = _bwd_stream_pallas(
            q, k, v, o, lse, do, scale, window, causal, block_q, block_k,
            interpret,
        )
    else:
        dq, dk, dv = _bwd_pallas(
            q, k, v, o, lse, do, scale, window, causal, block_q, block_k,
            interpret, kv_len,
        )
    return dq, dk, dv


_flash_attention_padded.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_attention_lse_padded(
    q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
):
    o, (_, _, _, _, lse) = _flash_fwd(
        q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
    )
    return o, lse


def _flash_lse_fwd(
    q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
):
    o, res = _flash_fwd(
        q, k, v, scale, window, causal, block_q, block_k, interpret, kv_len
    )
    return (o, res[4]), res


def _flash_lse_bwd(
    scale, window, causal, block_q, block_k, interpret, kv_len, res, cts
):
    do, dlse = cts
    q, k, v, o, lse = res
    if _use_streaming(q.shape[2], causal, kv_len):
        return _bwd_stream_pallas(
            q, k, v, o, lse, do, scale, window, causal, block_q, block_k,
            interpret, dlse=dlse,
        )
    return _bwd_pallas(
        q, k, v, o, lse, do, scale, window, causal, block_q, block_k,
        interpret, kv_len, dlse=dlse,
    )


_flash_attention_lse_padded.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    window_size: Optional[int] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
):
    """Flash attention returning ``(o, lse)`` with lse differentiable —
    the building block for cross-device softmax merging (ring attention):
    partial results over disjoint key sets combine exactly via

        m = max(lse_a, lse_b); w = exp(lse_x - m)
        o = (o_a*w_a + o_b*w_b)/(w_a+w_b); lse = m + log(w_a+w_b)

    and the lse cotangent folds into the existing backward kernels as a
    delta adjustment (dL/ds += dlse * p). Fully-masked rows carry
    lse ~ -1e30 and thus vanish from any merge. Requires 8-aligned S
    (no padding path — shards are produced aligned)."""
    b, h, s, d = q.shape
    if scale is None:
        scale = 1.0 / float(d) ** 0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    if impl != "reference":
        # kernels need 8-aligned S and lane-aligned D; ring shards are
        # produced aligned, other shapes use the jnp path
        if s % 8 or d not in (64, 128):
            impl = "reference"
    if impl == "reference":
        sc = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if causal:
            pos = jnp.arange(s)
            keep = pos[:, None] >= pos[None, :]
            if window_size is not None:
                keep &= pos[:, None] - pos[None, :] < window_size
            sc = jnp.where(keep[None, None], sc, MASK_VALUE)
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", (p / l).astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
        return o, m + jnp.log(l)
    default_block = 512 if s >= 1024 else DEFAULT_BLOCK_Q
    if s > LONG_SEQ_THRESHOLD:
        default_block = 256

    def _fit(blk):
        blk = min(blk, s)
        while s % blk:
            blk -= 8
        return blk

    block_q = _fit(block_q or default_block)
    block_k = _fit(block_k or default_block)
    return _flash_attention_lse_padded(
        q, k, v, float(scale), window_size, causal, block_q, block_k,
        impl == "interpret", None,
    )


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    window_size: Optional[int] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention over (B, H, S, D) with causal/sliding-window masking.

    ``impl``: "auto" (Pallas on TPU, jnp reference elsewhere), "pallas",
    "interpret" (Pallas in interpreter mode, for tests), or "reference".
    ``block_q``/``block_k`` default to a swept heuristic (512 for S >= 1024,
    else 128 — benchmarks/flash_sweep.py: 512x512 is 2.8x the masked
    reference at S=2048/window=512 vs 1.7x for 128x128; bigger blocks
    amortize the fori_loop and enlarge the unmasked interior).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    if impl == "reference":
        if window_size is not None and causal:
            return attention_ref.sliding_window_attention_ref(
                q, k, v, window_size, scale=scale
            )
        if causal:
            return attention_ref.causal_attention_ref(q, k, v, scale=scale)
        return attention_ref.mha_reference(q, k, v, scale=scale)

    interpret = impl == "interpret"
    b, h, s, d = q.shape
    if scale is None:
        scale = 1.0 / float(d) ** 0.5
    scale = float(scale)

    default_block = 512 if s >= 1024 else DEFAULT_BLOCK_Q
    if s > LONG_SEQ_THRESHOLD:
        # streaming kernels (no full-S residents); 256 keeps their fp32
        # (block, block) temporaries + scratch comfortably in VMEM.
        default_block = 256
    block_q = block_q or default_block
    block_k = block_k or default_block
    if s <= 512:
        # Short sequences: one block of the whole (8-aligned) sequence.
        # Minimizes padding copies (e.g. ViT's S=197 pads to 200, not 256).
        block_q = block_k = _ceil_to(s, 8)
    else:
        block_q = min(block_q, _ceil_to(s, 8))
        block_k = min(block_k, _ceil_to(s, 8))
    s_pad = _ceil_to(s, max(block_q, block_k))
    # Pad head_dim only to a 64-lane multiple: Mosaic handles 64-wide last
    # dims natively, and padding to 128 would DOUBLE the HBM traffic of
    # every q/k/v/o tensor (the step is bandwidth-bound; measured on the
    # ViT-B clip step this padding alone was worth ~2x attention bytes).
    d_pad = max(_ceil_to(d, 64), 64)
    if s_pad != s or d_pad != d:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)]
        qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    else:
        qp, kp, vp = q, k, v
    # Padded key positions sit *after* every real query position, so the
    # causal mask already excludes them; for non-causal attention the
    # static kv_len bound masks them instead.
    kv_len = s if (not causal and s_pad != s) else None
    o = _flash_attention_padded(
        qp, kp, vp, scale, window_size, causal, block_q, block_k, interpret, kv_len
    )
    return o[:, :, :s, :d]


# ---------------------------------------------------------------------------
# Fused-qkv flash attention (zero-transpose encoder path)
# ---------------------------------------------------------------------------
#
# The 4D API above requires (B, H, S, D) operands, which the model produces
# by split+transpose from the qkv projection output — at ViT-B/128 those
# layout copies alone were ~7.5 GB/step of HBM traffic (benchmarks/
# byte_audit.py). This API reads q/k/v DIRECTLY out of the (B, S, 3*H*D)
# Dense output and writes (B, S, H*D) ready for the output projection:
# no transpose, split, or (in the backward) concat copy ever materializes.
#
# Kernel shape: encoder sequences are short (ViT 200 tokens, text 64), so
# one grid program handles ONE BATCH ELEMENT with the full (S, 3*H*D) qkv
# block in VMEM and a static Python loop over heads — per-head q/k/v are
# 64-lane-aligned static slices of the block (Mosaic cannot express
# sub-128-lane BlockSpecs of a wide array, but in-VMEM slices are free).
# With the whole row in VMEM the softmax is a straight (not online) pass;
# lse is still emitted for the backward, which recomputes probabilities
# and writes dq/dk/dv into a single (S, 3*H*D) output. Sequences longer
# than MAX_FUSED_SEQ fall back to the 4D online-softmax kernels.
#
# Optional ``kv_lens`` (B,) masks keys at positions >= kv_lens[b] — the
# right-padded BERT text-tower contract (reference
# src/data/download_to_drive.py:52-64) — so the text tower runs on the
# flash kernel instead of the fp32 masked-reference path.

MAX_FUSED_SEQ = 512


def _mha_mask_2d(s, causal, window, kv_len_scalar, kv_bound):
    """(S, S) mask; None if no masking applies."""
    conds = []
    q_pos = jax.lax.broadcasted_iota(jnp.int32, s, 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, s, 1)
    if causal:
        conds.append(q_pos >= k_pos)
    if window is not None:
        conds.append(q_pos - k_pos < window)
    if kv_len_scalar is not None:
        conds.append(k_pos < kv_len_scalar)
    if kv_bound is not None:
        conds.append(k_pos < kv_bound)
    if not conds:
        return None
    mask = conds[0]
    for c in conds[1:]:
        mask = mask & c
    return mask


def _mha_fwd_kernel(
    *refs, scale, num_heads, head_dim, window, causal, has_lens, kv_bound,
    batch_block,
):
    if has_lens:
        qkv_ref, len_ref, o_ref, lse_ref = refs
    else:
        qkv_ref, o_ref, lse_ref = refs
    h, d = num_heads, head_dim
    seq = qkv_ref.shape[1]
    # Batch-independent mask hoisted out of the element loop.
    base_mask = _mha_mask_2d((seq, seq), causal, window, None, kv_bound)

    for bi in range(batch_block):
        x = qkv_ref[bi]  # (S, 3*H*D), input dtype (bf16 MXU fast path)
        mask = base_mask
        if has_lens:
            kv_len_scalar = len_ref[
                pl.program_id(0) * batch_block + bi, 0
            ].astype(jnp.int32)
            mask = _mha_mask_2d((seq, seq), causal, window, kv_len_scalar, kv_bound)
        for hi in range(h):
            q = x[:, hi * d:(hi + 1) * d]
            k = x[:, (h + hi) * d:(h + hi + 1) * d]
            v = x[:, (2 * h + hi) * d:(2 * h + hi + 1) * d]
            s = _dot(q, k, ((1,), (1,))) * scale  # (S, S) fp32
            if mask is not None:
                s = jnp.where(mask, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o = _dot((p / l_safe).astype(v.dtype), v, ((1,), (0,)))
            # Fully-masked rows (kv_lens[b] == 0): masked s is MASK_VALUE
            # everywhere, so p would be uniform and o the mean of v. Zero
            # those rows instead, consistent with the backward (which
            # masks p to 0) and the reference path.
            row_valid = (m > MASK_VALUE * 0.5).astype(o.dtype)
            o_ref[bi, :, hi * d:(hi + 1) * d] = (o * row_valid).astype(
                o_ref.dtype
            )
            lse_ref[bi, hi] = m + jnp.log(l_safe)


def _mha_bwd_kernel(
    *refs, scale, num_heads, head_dim, window, causal, has_lens, kv_bound,
    batch_block,
):
    if has_lens:
        qkv_ref, do_ref, lse_ref, len_ref, dqkv_ref = refs
    else:
        qkv_ref, do_ref, lse_ref, dqkv_ref = refs
    h, d = num_heads, head_dim
    seq = qkv_ref.shape[1]
    base_mask = _mha_mask_2d((seq, seq), causal, window, None, kv_bound)

    for bi in range(batch_block):
        x = qkv_ref[bi]
        mask = base_mask
        if has_lens:
            kv_len_scalar = len_ref[
                pl.program_id(0) * batch_block + bi, 0
            ].astype(jnp.int32)
            mask = _mha_mask_2d((seq, seq), causal, window, kv_len_scalar, kv_bound)
        for hi in range(h):
            q = x[:, hi * d:(hi + 1) * d]
            k = x[:, (h + hi) * d:(h + hi + 1) * d]
            v = x[:, (2 * h + hi) * d:(2 * h + hi + 1) * d]
            do = do_ref[bi, :, hi * d:(hi + 1) * d]
            lse = lse_ref[bi, hi]  # (S, 1)
            s = _dot(q, k, ((1,), (1,))) * scale
            p = jnp.exp(s - lse)  # normalized probabilities
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            pb = p.astype(do.dtype)
            dv = _dot(pb, do, ((0,), (0,)))
            dp = _dot(do, v, ((1,), (1,)))  # (S, S) fp32
            delta = jnp.sum(p * dp, axis=1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(q.dtype)
            dq = _dot(ds, k, ((1,), (0,)))
            dk = _dot(ds, q, ((0,), (0,)))
            dqkv_ref[bi, :, hi * d:(hi + 1) * d] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[bi, :, (h + hi) * d:(h + hi + 1) * d] = dk.astype(
                dqkv_ref.dtype
            )
            dqkv_ref[bi, :, (2 * h + hi) * d:(2 * h + hi + 1) * d] = dv.astype(
                dqkv_ref.dtype
            )


def _mha_batch_block(b, s, hd, dtype_bytes):
    """Batch elements per grid program. One-element programs are pure
    overhead at ViT-Ti scale (512 programs x ~2us prologue/DMA latency was
    ~27ms/step of the tiny preset's 81ms, profiled); blocking amortizes it.
    Budget 2.5MB of VMEM for the backward's resident blocks (qkv + dqkv +
    do = 7*S*HD bytes per element) — Mosaic double-buffers grid blocks and
    the per-head fp32 (S, S) intermediates live beside them, so a larger
    budget OOMs the 16MB scoped vmem (bb=8 at ViT-Ti measured 18.1MB)."""
    import os

    override = os.environ.get("FORDE_MHA_BB")
    bytes_per = 7 * s * hd * dtype_bytes
    bb = max(1, min(16, (2 * 1024 * 1024 + 512 * 1024) // max(bytes_per, 1)))
    if override:
        bb = min(int(override), b)
    while b % bb:
        bb -= 1
    return bb


def _mha_len_spec(b):
    # The whole (B, 1) lens vector sits in SMEM for every program (a
    # sub-array block would violate Mosaic's tiling rules); the kernel
    # picks its row with program_id.
    return pl.BlockSpec((b, 1), lambda bi: (0, 0), memory_space=pltpu.SMEM)


def _mha_fwd_pallas(
    qkv, lens, num_heads, head_dim, scale, window, causal, interpret, kv_bound
):
    b, s, _ = qkv.shape
    has_lens = lens is not None
    hd = num_heads * head_dim
    bb = _mha_batch_block(b, s, hd, qkv.dtype.itemsize)
    full = lambda width: pl.BlockSpec((bb, s, width), lambda bi: (bi, 0, 0))
    in_specs = [full(3 * hd)]
    args = [qkv]
    if has_lens:
        in_specs.append(_mha_len_spec(b))
        args.append(lens)
    kernel = functools.partial(
        _mha_fwd_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim,
        window=window, causal=causal, has_lens=has_lens, kv_bound=kv_bound,
        batch_block=bb,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=[
            full(hd),
            pl.BlockSpec((bb, num_heads, s, 1), lambda bi: (bi, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, num_heads, s, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return o, lse


def _mha_bwd_pallas(
    qkv, lens, lse, do, num_heads, head_dim, scale, window, causal,
    interpret, kv_bound,
):
    b, s, _ = qkv.shape
    has_lens = lens is not None
    hd = num_heads * head_dim
    bb = _mha_batch_block(b, s, hd, qkv.dtype.itemsize)
    full = lambda width: pl.BlockSpec((bb, s, width), lambda bi: (bi, 0, 0))
    in_specs = [
        full(3 * hd),
        full(hd),
        pl.BlockSpec((bb, num_heads, s, 1), lambda bi: (bi, 0, 0, 0)),
    ]
    args = [qkv, do, lse]
    if has_lens:
        in_specs.append(_mha_len_spec(b))
        args.append(lens)
    kernel = functools.partial(
        _mha_bwd_kernel, scale=scale, num_heads=num_heads, head_dim=head_dim,
        window=window, causal=causal, has_lens=has_lens, kv_bound=kv_bound,
        batch_block=bb,
    )
    return pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=full(3 * hd),
        out_shape=jax.ShapeDtypeStruct((b, s, 3 * hd), qkv.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _flash_mha_fused(
    qkv, lens, num_heads, head_dim, scale, window, causal, interpret, kv_bound
):
    o, _ = _mha_fwd_pallas(
        qkv, lens, num_heads, head_dim, scale, window, causal, interpret,
        kv_bound,
    )
    return o


def _mha_fwd_rule(
    qkv, lens, num_heads, head_dim, scale, window, causal, interpret, kv_bound
):
    o, lse = _mha_fwd_pallas(
        qkv, lens, num_heads, head_dim, scale, window, causal, interpret,
        kv_bound,
    )
    return o, (qkv, lens, lse)


def _mha_bwd_rule(
    num_heads, head_dim, scale, window, causal, interpret, kv_bound, res, do
):
    qkv, lens, lse = res
    dqkv = _mha_bwd_pallas(
        qkv, lens, lse, do, num_heads, head_dim, scale, window, causal,
        interpret, kv_bound,
    )
    dlens = None if lens is None else jnp.zeros_like(lens)
    return dqkv, dlens


_flash_mha_fused.defvjp(_mha_fwd_rule, _mha_bwd_rule)


def _mha_reference_path(qkv, num_heads, head_dim, kv_lens, causal, window, scale):
    b, s, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    def split(x):
        return x.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    if kv_lens is not None:
        # Combine kv_lens with causal/window masks (the fused kernel does)
        # so impl="reference" never silently diverges from the TPU path.
        mask = (
            jnp.arange(s)[None, :] < kv_lens.astype(jnp.int32)[:, None]
        )[:, None, None, :]
        q_pos = jnp.arange(s)[:, None]
        k_pos = jnp.arange(s)[None, :]
        if causal:
            mask = mask & (q_pos >= k_pos)[None, None]
        if window is not None:
            mask = mask & (q_pos - k_pos < window)[None, None]
        o = attention_ref.mha_reference(q, k, v, mask=mask, scale=scale)
        # Fully-masked rows (kv_lens[b] == 0) are zeroed, matching the
        # fused kernel's forward/backward (grads through the zero
        # multiply are zero for those rows in both impls).
        o = o * (kv_lens > 0).astype(o.dtype)[:, None, None, None]
    elif causal and window is not None:
        o = attention_ref.sliding_window_attention_ref(q, k, v, window, scale=scale)
    elif causal:
        o = attention_ref.causal_attention_ref(q, k, v, scale=scale)
    else:
        o = attention_ref.mha_reference(q, k, v, scale=scale)
    return o.transpose(0, 2, 1, 3).reshape(b, s, num_heads * head_dim)


def flash_mha(
    qkv: jnp.ndarray,
    num_heads: int,
    head_dim: int,
    *,
    causal: bool = False,
    window_size: Optional[int] = None,
    kv_lens: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention over a fused (B, S, 3*H*D) qkv projection output,
    returning (B, S, H*D) — zero layout copies on either side.

    ``kv_lens``: optional (B,) valid-key counts for right-padded batches
    (BERT contract, reference download_to_drive.py:52-64); keys at
    positions >= kv_lens[b] are masked for every query. Note padded
    *query* rows still produce (masked-key) outputs, exactly like the
    masked reference path — downstream pooling reads position 0 only.

    ``impl``: "auto" (Pallas on TPU, jnp reference elsewhere), "pallas",
    "interpret", "reference".
    """
    b, s, three_hd = qkv.shape
    assert three_hd == 3 * num_heads * head_dim, (three_hd, num_heads, head_dim)
    if scale is None:
        scale = 1.0 / float(head_dim) ** 0.5
    scale = float(scale)

    if impl == "auto":
        import os

        impl = os.environ.get(
            "FORDE_MHA_IMPL",
            "pallas" if jax.default_backend() == "tpu" else "reference",
        )
    if impl == "reference":
        return _mha_reference_path(
            qkv, num_heads, head_dim, kv_lens, causal, window_size, scale
        )
    if head_dim % 64 != 0 or s > MAX_FUSED_SEQ:
        # Per-head in-VMEM slices must be 64-lane-aligned, and the whole
        # (S, 3*H*D) block must fit VMEM; otherwise run the 4D online-
        # softmax kernels (which pad D / stream K blocks).
        assert kv_lens is None, (
            "kv_lens needs the fused kernel (64-aligned head_dim, "
            f"S <= {MAX_FUSED_SEQ}); got head_dim={head_dim}, S={s}"
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def _to4(x):
            return x.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        o = flash_attention(
            _to4(q), _to4(k), _to4(v), causal=causal,
            window_size=window_size, scale=scale, impl=impl,
            block_q=block_q, block_k=block_k,
        )
        return o.transpose(0, 2, 1, 3).reshape(b, s, num_heads * head_dim)
    interpret = impl == "interpret"

    s_pad = _ceil_to(s, 8)
    kv_bound = None
    if s_pad != s:
        qkv = jnp.pad(qkv, [(0, 0), (0, s_pad - s), (0, 0)])
        if not causal and kv_lens is None:
            kv_bound = s  # static mask for the padded tail
    lens = None
    if kv_lens is not None:
        # f32 carries exact ints < 2^24 and keeps custom_vjp cotangents
        # well-defined (int operands can't take zeros cotangents).
        lens = jnp.minimum(kv_lens, s).astype(jnp.float32).reshape(b, 1)

    o = _flash_mha_fused(
        qkv, lens, num_heads, head_dim, scale, window_size, causal,
        interpret, kv_bound,
    )
    return o[:, :s, :]
