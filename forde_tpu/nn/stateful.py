"""StatefulLayer: the adaptive MLP replacement of the FORDE dual encoder.

Spec: reference README.md:47-56 (no code exists in the reference — the
dual-encoder implementation was removed in its LLM pivot, SURVEY.md §0).

  1. Reads cached integer per-neuron ``assignments`` from the ``brain``
     variable collection (the "brain map" the slow loop rewrites).
  2. Multiplexes each neuron through relu / tanh / straight-through
     binary_step by assignment, plus a gated residual (specialist gate
     0.1) — XLA fuses this into the surrounding matmuls (ops/stateful.py;
     hand-written Pallas fusions measured slower, see PERF.md).
  3. Silently logs activation statistics (Hoyer gini, GDP, variance) into
     the ``stats_buffer`` collection, and exposes a gradient tap
     (``nn.perturb``) so the train step can harvest dL/dz for the
     grad_gini / grad_gdp statistics (the grad-sink mechanism prototyped in
     reference tests/reproduce_grad_sink.py:7-68 but never wired in).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

import jax

from forde_tpu.brain.sensing import hoyer_sparsity
from forde_tpu.ops.stat_sums import moment_sums
from forde_tpu.ops.stateful import grad_stat_tap, stateful_multiplex

GRAD_TAP_NAME = "z_tap"


def activation_stats(z: jnp.ndarray) -> jnp.ndarray:
    """Per-neuron [act_gini, act_gdp, act_var] for one step; z (..., F).

    Moment sums via ops/stat_sums.moment_sums (XLA reduction passes by
    default — the single-pass pallas variant measured slower, see that
    module's docstring); fp32 accumulators, no fp32 copy of z is ever
    materialized. stop_gradient because the stats feed a mutable
    collection, not the loss (cotangent is zero).
    """
    f = z.shape[-1]
    flat = z.reshape(-1, f)
    n = flat.shape[0]
    l1, sumsq, sm = moment_sums(jax.lax.stop_gradient(flat))
    mean = sm / n
    l2 = jnp.sqrt(sumsq)
    safe_l2 = jnp.where(l2 == 0, 1.0, l2)
    denom = (float(n) ** 0.5 - 1.0) if n > 1 else 1.0
    gini = jnp.where(l2 == 0, 0.0, (float(n) ** 0.5 - l1 / safe_l2) / denom)
    gdp = l1 / n
    var = jnp.maximum(sumsq / n - mean**2, 0.0)
    return jnp.stack([gini, gdp, var], axis=-1)


def gradient_stats(g: jnp.ndarray) -> jnp.ndarray:
    """Per-neuron [grad_gini, grad_gdp] from a dL/dz tap; g (..., F)."""
    f = g.shape[-1]
    flat = g.reshape(-1, f).astype(jnp.float32)
    return jnp.stack(
        [hoyer_sparsity(flat, axis=0), jnp.mean(jnp.abs(flat), axis=0)], axis=-1
    )


class StatefulLayer(nn.Module):
    """Adaptive MLP: Dense -> multiplexed activation + gated residual ->
    Dense, with brain-map state and fast-loop sensing."""

    hidden_dim: int
    d_model: int
    specialist_gate: float = 0.1
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    sense: bool = True
    # NOTE (measured, v5e): do NOT subsample the sensing inputs to save
    # stat bandwidth. Both a strided z[::4] and a contiguous-prefix
    # z[:B//4] were tried at ViT-Ti: the sliced reductions stop fusing
    # with their producers, force extra layouts, and compile
    # pathologically — 6,663 -> 4,947 pairs/s despite reading 4x fewer
    # stat bytes. Full-population sensing is the fast configuration.

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # NOTE: this stays the XLA-fused jnp composition ON PURPOSE. Two
        # Pallas fusions were built and measured slower on v5e at ViT-B:
        # the standalone elementwise multiplex (fusion barrier, -35%) and
        # a matmul-anchored full fusion (w_in + multiplex + sensing in one
        # VMEM pass, git ca6af0c): 7.82 vs 5.03 ms/step, because the
        # flash-style backward z-recompute (+125 GFLOP) costs more than
        # the ~330 MB of z traffic it saves. XLA's matmul+epilogue fusion
        # is optimal here; see PERF.md "StatefulLayer fusion".
        z = nn.Dense(self.hidden_dim, name="w_in", dtype=self.dtype)(x)

        assignments = self.variable(
            "brain",
            "neuron_assignments",
            lambda: jnp.zeros((self.hidden_dim,), jnp.int32),
        )

        if self.sense:
            # Gradient tap: differentiating the loss w.r.t. this (F, 2)
            # slot yields per-neuron [grad_gini, grad_gdp] — the stats
            # reduction runs inside the backward pass itself, so no
            # (B, S, F) sink tensor ever exists (ops/stateful.grad_stat_tap).
            # Availability mirrors nn.perturb: active at init, when the
            # collection is supplied, or when it is mutable.
            if (
                self.is_initializing()
                or self.has_variable("perturbations", GRAD_TAP_NAME)
                or self.is_mutable_collection("perturbations")
            ):
                slot = self.variable(
                    "perturbations",
                    GRAD_TAP_NAME,
                    lambda: jnp.zeros((self.hidden_dim, 2), jnp.float32),
                )
                z = grad_stat_tap(z, slot.value)

            act_stats = self.variable(
                "stats_buffer",
                "act_stats",
                lambda: jnp.zeros((self.hidden_dim, 3), jnp.float32),
            )
            step_count = self.variable(
                "stats_buffer", "step_count", lambda: jnp.array(0, jnp.int32)
            )
            if not self.is_initializing():
                act_stats.value = act_stats.value + activation_stats(z)
                step_count.value = step_count.value + 1

        y = stateful_multiplex(
            z, assignments.value, self.specialist_gate, impl=self.impl
        )
        return nn.Dense(self.d_model, name="w_out", dtype=self.dtype)(
            y.astype(self.dtype)
        )
