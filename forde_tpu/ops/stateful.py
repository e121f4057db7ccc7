"""Fused StatefulLayer op: k-way activation multiplex + straight-through
binary step + gated residual in a single VMEM pass.

This is the actuator at the heart of the FORDE dual encoder
(reference README.md:47-56 — no code exists in the reference; the spec is):

    F(z) = relu(z)         where assignment == 0  (Generalist)
           tanh(z)         where assignment == 1  (Pooling)
           binary_step(z)  where assignment == 2  (Specialist)
    out  = F(z) + gate * z,   gate = 0.1 for specialists else 1.0

The jnp reference path composes three jnp.where passes; the Pallas kernel
does one read + one write of the activation tensor (the op is bandwidth-
bound, so fusing the multiplex, step, and residual halves HBM traffic vs
an unfused chain). The straight-through gradient for the specialist branch
is defined once in the shared custom_vjp:

    d out / d z = relu'(z)          (gen)     = 1[z > 0]
                  1 - tanh(z)^2     (pool)
                  1                 (spec, straight-through)
                + gate
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

GENERALIST, POOLING, SPECIALIST = 0, 1, 2


def _multiplex_fwd_math(z, assignments, specialist_gate):
    """Shared forward math on (rows, F) blocks; assignments (1, F).

    Runs in the input dtype: the three activation branches are computed for
    EVERY element and selected per neuron (the reference's jnp.where
    multiplex contract, README.md:51-54), so avoiding an fp32 materialized
    copy matters — at ViT-B this was ~40GB/step of convert+tanh traffic.
    """
    dt = z.dtype
    fz = jnp.where(
        assignments == GENERALIST,
        jnp.maximum(z, jnp.zeros((), dt)),
        jnp.where(
            assignments == POOLING,
            jnp.tanh(z),
            (z > 0).astype(dt),
        ),
    )
    gate = jnp.where(
        assignments == SPECIALIST,
        jnp.asarray(specialist_gate, dt),
        jnp.ones((), dt),
    )
    return fz + gate * z


def _multiplex_bwd_math(z, assignments, specialist_gate, g):
    dt = z.dtype
    dfdz = jnp.where(
        assignments == GENERALIST,
        (z > 0).astype(dt),
        jnp.where(
            assignments == POOLING,
            jnp.asarray(1.0, dt) - jnp.tanh(z) ** 2,
            jnp.ones((), dt),  # straight-through binary step
        ),
    )
    gate = jnp.where(
        assignments == SPECIALIST,
        jnp.asarray(specialist_gate, dt),
        jnp.ones((), dt),
    )
    return (g.astype(dt) * (dfdz + gate)).astype(z.dtype)


def _fwd_kernel(z_ref, a_ref, o_ref, *, specialist_gate):
    o_ref[:] = _multiplex_fwd_math(
        z_ref[:], a_ref[:], specialist_gate
    ).astype(o_ref.dtype)


def _bwd_kernel(z_ref, a_ref, g_ref, dz_ref, *, specialist_gate):
    dz_ref[:] = _multiplex_bwd_math(
        z_ref[:], a_ref[:], specialist_gate, g_ref[:]
    )


def _pallas_apply(kernel, out_dtype, z2d, a2d, *extra, interpret):
    n, f = z2d.shape
    # Size blocks to VMEM: fp32 intermediates x (inputs + grads + output) x
    # double buffering must stay well under the ~16MB scoped limit.
    rows_budget = max(8, (256 * 1024) // max(f, 1))
    block_n = min(512, rows_budget // 8 * 8 or 8, max(n, 8))
    # pad rows to a block multiple; padded rows are sliced off after.
    n_pad = ((n + block_n - 1) // block_n) * block_n
    if n_pad != n:
        z2d = jnp.pad(z2d, ((0, n_pad - n), (0, 0)))
        extra = tuple(jnp.pad(e, ((0, n_pad - n), (0, 0))) for e in extra)
    grid = (n_pad // block_n,)
    row_spec = pl.BlockSpec((block_n, f), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, pl.BlockSpec((1, f), lambda i: (0, 0))]
        + [row_spec] * len(extra),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), out_dtype),
        interpret=interpret,
    )(z2d, a2d, *extra)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _stateful_multiplex(z, assignments, specialist_gate, impl):
    return _forward(z, assignments, specialist_gate, impl)


def _forward(z, assignments, specialist_gate, impl):
    shape = z.shape
    f = shape[-1]
    a2d = assignments.reshape(1, f)
    if impl == "reference":
        return _multiplex_fwd_math(
            z.reshape(-1, f), a2d, specialist_gate
        ).astype(z.dtype).reshape(shape)
    out = _pallas_apply(
        functools.partial(_fwd_kernel, specialist_gate=specialist_gate),
        z.dtype,
        z.reshape(-1, f),
        a2d,
        interpret=(impl == "interpret"),
    )
    return out.reshape(shape)


def _stateful_fwd(z, assignments, specialist_gate, impl):
    return _forward(z, assignments, specialist_gate, impl), (z, assignments)


def _stateful_bwd(specialist_gate, impl, res, g):
    z, assignments = res
    shape = z.shape
    f = shape[-1]
    a2d = assignments.reshape(1, f)
    if impl == "reference":
        dz = _multiplex_bwd_math(
            z.reshape(-1, f), a2d, specialist_gate, g.reshape(-1, f)
        )
    else:
        dz = _pallas_apply(
            functools.partial(_bwd_kernel, specialist_gate=specialist_gate),
            z.dtype,
            z.reshape(-1, f),
            a2d,
            g.reshape(-1, f),
            interpret=(impl == "interpret"),
        )
    return dz.reshape(shape), None


_stateful_multiplex.defvjp(_stateful_fwd, _stateful_bwd)


def stateful_multiplex(
    z: jnp.ndarray,
    assignments: jnp.ndarray,
    specialist_gate: float = 0.1,
    impl: str = "auto",
) -> jnp.ndarray:
    """Apply the FORDE neuron multiplex to (..., F) pre-activations.

    ``assignments``: int32 (F,) neuron types (0 gen / 1 pool / 2 spec).
    ``impl``: "auto", "pallas", "interpret", "reference".

    NOTE: "auto" selects the jnp path even on TPU. Measured on v5e at
    ViT-B/16: the standalone Pallas kernel costs ~100ms/step (386 vs 288)
    because a pallas_call is an XLA fusion barrier — the multiplex is
    elementwise and XLA fuses it into the surrounding matmuls for free,
    which beats a hand-written kernel that forces the activation through
    HBM on both sides. The kernel remains available ("pallas") and is the
    building block for a future fully-fused matmul+multiplex kernel.
    """
    if impl == "auto":
        impl = "reference"
    return _stateful_multiplex(z, assignments.astype(jnp.int32), float(specialist_gate), impl)


# ---------------------------------------------------------------------------
# Gradient-stat tap: sensing fused into the backward pass
# ---------------------------------------------------------------------------


def _grad_stats_from_cotangent(g: jnp.ndarray) -> jnp.ndarray:
    """Per-neuron [grad_gini (Hoyer), grad_gdp (mean |g|)] from dL/dz."""
    f = g.shape[-1]
    flat = g.reshape(-1, f).astype(jnp.float32)
    n = flat.shape[0]
    l1 = jnp.sum(jnp.abs(flat), axis=0)
    l2 = jnp.sqrt(jnp.sum(flat * flat, axis=0))
    safe_l2 = jnp.where(l2 == 0, 1.0, l2)
    denom = (float(n) ** 0.5 - 1.0) if n > 1 else 1.0
    gini = jnp.where(l2 == 0, 0.0, (float(n) ** 0.5 - l1 / safe_l2) / denom)
    gdp = l1 / n
    return jnp.stack([gini, gdp], axis=-1)


@jax.custom_vjp
def grad_stat_tap(z: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """Identity on ``z``; the cotangent of ``slot`` (an (F, 2) zeros buffer)
    comes back as the per-neuron gradient statistics of dL/dz.

    This realizes the reference's grad-sink idea
    (tests/reproduce_grad_sink.py:7-68) without ever materializing a
    (B, S, F) sink: the stats reduction runs INSIDE the same backward pass
    as the weight gradients and only (F, 2) leaves the tap. Differentiate
    the loss w.r.t. the 'perturbations' collection to harvest them.
    """
    del slot
    return z


def _tap_fwd(z, slot):
    del slot
    return z, None


def _tap_bwd(_, g):
    return g, _grad_stats_from_cotangent(g)


grad_stat_tap.defvjp(_tap_fwd, _tap_bwd)
