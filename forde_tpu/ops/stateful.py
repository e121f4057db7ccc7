"""StatefulLayer multiplex op: k-way activation multiplex +
straight-through binary step + gated residual.

This is the actuator at the heart of the FORDE dual encoder
(reference README.md:47-56 — no code exists in the reference; the spec is):

    F(z) = relu(z)         where assignment == 0  (Generalist)
           tanh(z)         where assignment == 1  (Pooling)
           binary_step(z)  where assignment == 2  (Specialist)
    out  = F(z) + gate * z,   gate = 0.1 for specialists else 1.0

The straight-through gradient for the specialist branch is defined in the
custom_vjp:

    d out / d z = relu'(z)          (gen)     = 1[z > 0]
                  1 - tanh(z)^2     (pool)
                  1                 (spec, straight-through)
                + gate

Implementation note (v5e, ViT-B, bf16 — see PERF.md "StatefulLayer
fusion"): this op deliberately stays a jnp composition that XLA fuses
into the surrounding matmuls. Two Pallas variants were built, verified,
and measured SLOWER: (a) a standalone elementwise multiplex kernel
(-35%/step — a pallas_call is an XLA fusion barrier, so it forces the
activation through HBM on both sides); (b) a matmul-anchored full fusion
of w_in + multiplex + sensing with a flash-style z-recompute backward
(git ca6af0c): 7.82 vs 5.03 ms/step, because the recompute (+125 GFLOP)
costs more than the ~330 MB of z traffic it saves. At StatefulLayer's
arithmetic intensity (Din=768, F=3072) the roofline agrees: the saved
traffic (~0.4 ms) never exceeds the extra matmul (~0.6 ms at peak), so
XLA fusion is optimal and the kernels were removed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stateful_multiplex(z, assignments, specialist_gate):
    return _forward(z, assignments, specialist_gate)


def _forward(z, assignments, specialist_gate):
    shape = z.shape
    f = shape[-1]
    a2d = assignments.reshape(1, f)
    return _multiplex_fwd_math(
        z.reshape(-1, f), a2d, specialist_gate
    ).astype(z.dtype).reshape(shape)


def _stateful_fwd(z, assignments, specialist_gate):
    return _forward(z, assignments, specialist_gate), (z, assignments)


def _stateful_bwd(specialist_gate, res, g):
    z, assignments = res
    shape = z.shape
    f = shape[-1]
    a2d = assignments.reshape(1, f)
    dz = _multiplex_bwd_math(
        z.reshape(-1, f), a2d, specialist_gate, g.reshape(-1, f)
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
    ``impl`` is accepted for API stability but every value runs the same
    XLA-fused jnp path — measured optimal on TPU; the two slower Pallas
    variants were removed (module docstring has the numbers).
    """
    del impl
    return _stateful_multiplex(
        z, assignments.astype(jnp.int32), float(specialist_gate)
    )


# ---------------------------------------------------------------------------
# Gradient-stat tap: sensing fused into the backward pass
# ---------------------------------------------------------------------------


def _grad_stats_from_cotangent(g: jnp.ndarray) -> jnp.ndarray:
    """Per-neuron [grad_gini (Hoyer), grad_gdp (mean |g|)] from dL/dz.

    Both moment sums come from one pass over g (ops/stat_sums)."""
    from forde_tpu.ops.stat_sums import moment_sums

    f = g.shape[-1]
    flat = g.reshape(-1, f)
    n = flat.shape[0]
    l1, sumsq, _ = moment_sums(flat)
    l2 = jnp.sqrt(sumsq)
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
