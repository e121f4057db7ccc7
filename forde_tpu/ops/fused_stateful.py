"""Matmul-anchored fused StatefulLayer: w_in projection + FORDE neuron
multiplex + fast-loop sensing in one Pallas pass.

The StatefulLayer region (reference README.md:47-56) is the dual encoder's
dominant HBM consumer: the unfused chain writes the (N, F) pre-activation
``z = x @ W + b``, reads it for the activation statistics, reads it again
for the multiplex, and in the backward reads it once more for the
multiplex derivative — ~1 GB of z round-trips per ViT-B block per step
(benchmarks/byte_audit.py). Round 1's standalone elementwise multiplex
kernel made this WORSE (a pallas_call is an XLA fusion barrier;
ops/stateful.py note). The fix is anchoring the kernel on the matmul:

  forward:  one pass computes z tile-wise in VMEM (fp32 MXU accumulate),
            rounds to the compute dtype, accumulates the activation-stat
            sums (L1 / sum-of-squares / sum, fp32) across the row grid,
            applies the multiplex, and writes ONLY y. z never reaches HBM.
  backward: recomputes z from x and W (flash-attention-style remat),
            forms dz = dy * multiplex'(z), writes dz (consumed by XLA's
            dW matmul), computes dx = dz @ W^T on the MXU in-kernel, and
            accumulates the gradient-stat sums (L1 / sum-of-squares) that
            realize the grad-sink mechanism (reference
            tests/reproduce_grad_sink.py:7-68) — the ``slot`` cotangent
            comes back as per-neuron [grad_gini, grad_gdp], exactly like
            ops/stateful.grad_stat_tap.

Multiplex semantics are shared with ops/stateful.py (README.md:51-54):
    F(z) = relu(z) | tanh(z) | binary_step(z)  by assignment 0/1/2
    out  = F(z) + gate * z,  gate = specialist_gate for 2 else 1.0
with the straight-through estimator for the binary step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

GENERALIST, POOLING, SPECIALIST = 0, 1, 2


def _branch_masks(assignments):
    """Per-neuron one-hot branch selectors as (1, F) fp32. Mosaic cannot
    relayout a broadcast (1, F) i1 vector into a (rows, F) select, so the
    multiplex uses arithmetic masks (x0/x1 multiplies) instead of
    jnp.where — numerically identical for finite z."""
    is_gen = (assignments == GENERALIST).astype(jnp.float32)
    is_pool = (assignments == POOLING).astype(jnp.float32)
    is_spec = (assignments == SPECIALIST).astype(jnp.float32)
    return is_gen, is_pool, is_spec


def _multiplex_fwd_math(zf, assignments, specialist_gate):
    """relu/tanh/binary-step multiplex + gated residual on fp32 ``zf``
    (reference README.md:51-54; same semantics as ops/stateful.py).
    fp32 throughout: this target's VPU has no sub-fp32 comparisons."""
    is_gen, is_pool, is_spec = _branch_masks(assignments)
    fz = (
        is_gen * jnp.maximum(zf, 0.0)
        + is_pool * jnp.tanh(zf)
        + is_spec * (zf > 0).astype(jnp.float32)
    )
    gate = 1.0 + is_spec * (specialist_gate - 1.0)
    return fz + gate * zf


def _multiplex_bwd_math(zf, assignments, specialist_gate, gf):
    is_gen, is_pool, is_spec = _branch_masks(assignments)
    dfdz = (
        is_gen * (zf > 0).astype(jnp.float32)
        + is_pool * (1.0 - jnp.tanh(zf) ** 2)
        + is_spec  # straight-through binary step
    )
    gate = 1.0 + is_spec * (specialist_gate - 1.0)
    return gf * (dfdz + gate)


def _dot(a, b, dims):
    """fp32-accumulating matmul keeping bf16 operands on the MXU fast path
    (pins DEFAULT precision so ambient "highest" can't force an
    un-lowerable fp32 contract; see ops/flash_attention._dot)."""
    prec = None if a.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )


def _block_rows(din: int, f: int, dtype_bytes: int) -> int:
    """Rows per grid step: W stays resident in VMEM; tile buffers
    (x, y, dy, dz, dx + the fp32 z accumulator) must fit the remainder
    of the ~16MB budget with double buffering."""
    w_bytes = din * f * dtype_bytes
    budget = 12 * 1024 * 1024 - w_bytes
    per_row = f * (4 + 4 * dtype_bytes) + 2 * din * (dtype_bytes + 4)
    rows = max(32, min(512, budget // max(per_row, 1)))
    return rows // 8 * 8


def _fwd_kernel(x_ref, w_ref, b_ref, a_ref, y_ref, asum_ref, *, gate):
    i = pl.program_id(0)
    z = _dot(x_ref[...], w_ref[...], ((1,), (0,))) + b_ref[...].astype(
        jnp.float32
    )
    # Round exactly like the unfused Dense, then lift back to fp32: the
    # multiplex and stats run on the ROUNDED values in fp32 arithmetic.
    zf = z.astype(y_ref.dtype).astype(jnp.float32)
    y_ref[...] = _multiplex_fwd_math(zf, a_ref[...], gate).astype(y_ref.dtype)

    # Padded tail rows (x = 0) contribute exactly bias per row; the wrapper
    # subtracts that closed form rather than masking in-kernel.
    f = zf.shape[-1]
    l1 = jnp.sum(jnp.abs(zf), axis=0, keepdims=True)
    sq = jnp.sum(zf * zf, axis=0, keepdims=True)
    sm = jnp.sum(zf, axis=0, keepdims=True)
    part = jnp.concatenate([l1, sq, sm, jnp.zeros((5, f), jnp.float32)], 0)

    @pl.when(i == 0)
    def _():
        asum_ref[...] = jnp.zeros_like(asum_ref)

    asum_ref[...] += part


def _bwd_kernel(
    x_ref, w_ref, b_ref, a_ref, dy_ref, dz_ref, dx_ref, gsum_ref, *, gate
):
    # Padded rows: dy = 0 => dz = 0; no stat pollution, no mask needed.
    i = pl.program_id(0)
    z = _dot(x_ref[...], w_ref[...], ((1,), (0,))) + b_ref[...].astype(
        jnp.float32
    )
    zf = z.astype(dy_ref.dtype).astype(jnp.float32)
    dzf = _multiplex_bwd_math(
        zf, a_ref[...], gate, dy_ref[...].astype(jnp.float32)
    )
    dzc = dzf.astype(dz_ref.dtype)  # the bf16 value every consumer sees
    dz_ref[...] = dzc
    dx_ref[...] = _dot(dzc, w_ref[...], ((1,), (1,))).astype(dx_ref.dtype)

    dzf = dzc.astype(jnp.float32)
    f = dzf.shape[-1]
    l1 = jnp.sum(jnp.abs(dzf), axis=0, keepdims=True)
    sq = jnp.sum(dzf * dzf, axis=0, keepdims=True)
    part = jnp.concatenate([l1, sq, jnp.zeros((6, f), jnp.float32)], 0)

    @pl.when(i == 0)
    def _():
        gsum_ref[...] = jnp.zeros_like(gsum_ref)

    gsum_ref[...] += part


def _pad_rows(x2d, block_n):
    n = x2d.shape[0]
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))
    return x2d, n_pad


def _hoyer_from_sums(l1, sumsq, n):
    l2 = jnp.sqrt(sumsq)
    safe_l2 = jnp.where(l2 == 0, 1.0, l2)
    denom = (float(n) ** 0.5 - 1.0) if n > 1 else 1.0
    return jnp.where(l2 == 0, 0.0, (float(n) ** 0.5 - l1 / safe_l2) / denom)


def _fwd_sums_to_stats(asums, n):
    """(8, F) kernel sums -> (F, 3) [act_gini, act_gdp, act_var]
    (matches nn/stateful.activation_stats)."""
    l1, sumsq, sm = asums[0], asums[1], asums[2]
    gini = _hoyer_from_sums(l1, sumsq, n)
    gdp = l1 / n
    mean = sm / n
    var = jnp.maximum(sumsq / n - mean**2, 0.0)
    return jnp.stack([gini, gdp, var], axis=-1)


def _bwd_sums_to_stats(gsums, n):
    """(8, F) kernel sums -> (F, 2) [grad_gini, grad_gdp]
    (matches ops/stateful._grad_stats_from_cotangent)."""
    l1, sumsq = gsums[0], gsums[1]
    return jnp.stack([_hoyer_from_sums(l1, sumsq, n), l1 / n], axis=-1)


# ---------------------------------------------------------------------------
# jnp twin (CPU tests / ground truth)
# ---------------------------------------------------------------------------


def _ref_forward(x2d, kernel, bias, assignments, gate):
    """Mirrors the kernel exactly: fp32 matmul accumulate, round to the
    input dtype, lift to fp32 for multiplex + stats."""
    z = _dot(x2d, kernel, ((1,), (0,))) + bias.astype(jnp.float32)
    zf = z.astype(x2d.dtype).astype(jnp.float32)
    a2d = assignments.reshape(1, -1)
    y = _multiplex_fwd_math(zf, a2d, gate).astype(x2d.dtype)
    f = zf.shape[-1]
    sums = jnp.concatenate(
        [
            jnp.sum(jnp.abs(zf), 0, keepdims=True),
            jnp.sum(zf * zf, 0, keepdims=True),
            jnp.sum(zf, 0, keepdims=True),
            jnp.zeros((5, f), jnp.float32),
        ],
        0,
    )
    return y, sums, zf


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x2d, kernel, bias, assignments, slot, gate, impl, n_valid):
    y, asums = _run_fwd(x2d, kernel, bias, assignments, gate, impl, n_valid)
    return y, _fwd_sums_to_stats(asums, n_valid)


def _run_fwd(x2d, kernel, bias, assignments, gate, impl, n_valid):
    if impl == "reference":
        y, sums, _ = _ref_forward(x2d, kernel, bias, assignments, gate)
        return y, sums
    din, f = kernel.shape
    block_n = _block_rows(din, f, x2d.dtype.itemsize)
    xp, n_pad = _pad_rows(x2d, block_n)
    grid = (n_pad // block_n,)
    y, asums = pl.pallas_call(
        functools.partial(_fwd_kernel, gate=gate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, din), lambda i: (i, 0)),
            pl.BlockSpec((din, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, f), lambda i: (i, 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f), x2d.dtype),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
        ],
        interpret=(impl == "interpret"),
    )(xp, kernel, bias.reshape(1, f), assignments.reshape(1, f))
    n_padded_rows = n_pad - x2d.shape[0]
    if n_padded_rows:
        # Remove the padded rows' closed-form contribution (z = bias).
        zb = bias.astype(jnp.float32)
        corr = jnp.stack(
            [jnp.abs(zb), zb * zb, zb]
            + [jnp.zeros_like(zb)] * 5,
            axis=0,
        ) * float(n_padded_rows)
        asums = asums - corr
    return y[: x2d.shape[0]], asums


def _fused_fwd(x2d, kernel, bias, assignments, slot, gate, impl, n_valid):
    y, asums = _run_fwd(x2d, kernel, bias, assignments, gate, impl, n_valid)
    stats = _fwd_sums_to_stats(asums, n_valid)
    return (y, stats), (x2d, kernel, bias, assignments, slot)


def _fused_bwd(gate, impl, n_valid, res, cotangents):
    dy, _dstats = cotangents  # stats feed a mutable collection, not the loss
    x2d, kernel, bias, assignments, slot = res

    if impl == "reference":
        _, _, zf = _ref_forward(x2d, kernel, bias, assignments, gate)
        a2d = assignments.reshape(1, -1)
        dzf = _multiplex_bwd_math(zf, a2d, gate, dy.astype(jnp.float32))
        dz = dzf.astype(x2d.dtype)  # the rounded value every consumer sees
        dx = _dot(dz, kernel, ((1,), (1,))).astype(x2d.dtype)
        dzf = dz.astype(jnp.float32)
        gsums = jnp.concatenate(
            [
                jnp.sum(jnp.abs(dzf), 0, keepdims=True),
                jnp.sum(dzf * dzf, 0, keepdims=True),
                jnp.zeros((6, dz.shape[-1]), jnp.float32),
            ],
            0,
        )
    else:
        din, f = kernel.shape
        block_n = _block_rows(din, f, x2d.dtype.itemsize)
        xp, n_pad = _pad_rows(x2d, block_n)
        dyp, _ = _pad_rows(dy, block_n)
        grid = (n_pad // block_n,)
        dz, dx, gsums = pl.pallas_call(
            functools.partial(_bwd_kernel, gate=gate),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_n, din), lambda i: (i, 0)),
                pl.BlockSpec((din, f), lambda i: (0, 0)),
                pl.BlockSpec((1, f), lambda i: (0, 0)),
                pl.BlockSpec((1, f), lambda i: (0, 0)),
                pl.BlockSpec((block_n, f), lambda i: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_n, f), lambda i: (i, 0)),
                pl.BlockSpec((block_n, din), lambda i: (i, 0)),
                pl.BlockSpec((8, f), lambda i: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, f), x2d.dtype),
                jax.ShapeDtypeStruct((n_pad, din), x2d.dtype),
                jax.ShapeDtypeStruct((8, f), jnp.float32),
            ],
            interpret=(impl == "interpret"),
        )(xp, kernel, bias.reshape(1, f), assignments.reshape(1, f), dyp)
        dz = dz[: x2d.shape[0]]
        dx = dx[: x2d.shape[0]]

    # dW via XLA (the one matmul left outside: VMEM can't hold the fp32
    # (Din, F) accumulator next to W at ViT-B scale).
    dkernel = _dot(x2d, dz, ((0,), (0,))).astype(kernel.dtype)
    dbias = jnp.sum(dz.astype(jnp.float32), axis=0).astype(bias.dtype)
    dslot = _bwd_sums_to_stats(gsums, x2d.shape[0]).astype(slot.dtype)
    return dx, dkernel, dbias, None, dslot


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_stateful_mlp(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    assignments: jnp.ndarray,
    slot: jnp.ndarray,
    specialist_gate: float = 0.1,
    impl: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``multiplex(x @ kernel + bias)`` with in-pass sensing.

    x: (..., Din); kernel: (Din, F) and bias (F,) ALREADY cast to the
    compute dtype; assignments: int32 (F,) brain map; slot: (F, 2) zeros
    whose cotangent returns [grad_gini, grad_gdp] per neuron.

    Returns (y (..., F), act_stats (F, 3) [act_gini, act_gdp, act_var]).
    ``impl``: "auto" (Pallas on TPU, jnp twin elsewhere), "pallas",
    "interpret", "reference".
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "reference"
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    y, stats = _fused(
        x2d,
        kernel,
        bias,
        assignments.astype(jnp.int32),
        slot,
        float(specialist_gate),
        impl,
        x2d.shape[0],
    )
    return y.reshape(shape[:-1] + (kernel.shape[1],)), stats
