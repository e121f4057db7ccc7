"""Low-precision-moment Adam for HBM-traffic reduction.

The fp32 Adam moments are read AND written every step — at ViT-B dual
encoder scale (~140M params) that is ~2.2 GB/step of pure optimizer
traffic on a bandwidth-bound step (PERF.md "Headline"). Storing both
moments in bfloat16 halves it; all update math still runs in fp32
(moments are upcast, EMA'd, bias-corrected, then rounded back to storage
dtype once per step).

Numerics: bf16 keeps fp32's exponent range (no over/underflow vs fp32)
with an 8-bit mantissa (~0.4% relative rounding). For mu (EMA weight
1-b1 = 0.1 per step) rounding is far below the per-step contribution.
For nu (1-b2 = 0.001) per-step contributions smaller than ~0.4% of the
running value round away — acceptable in practice (nu only sets the
per-parameter step SCALE through a sqrt, halving the relative error
again); the Markov-chain learning run in README.md re-validates the
trajectory with this path enabled.

Parity note: the reference trains with torch.optim.AdamW defaults
(reference src/training/train.py:74-77); moment_dtype=None reproduces
exactly optax.adamw and remains the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Optional[jnp.dtype] = jnp.bfloat16,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with both moments stored in ``moment_dtype``.

    Update math is fp32 regardless of storage dtype; ``moment_dtype=None``
    stores in the param dtype (standard optax behavior).
    """

    def _store(x, like):
        return x.astype(moment_dtype if moment_dtype is not None else like.dtype)

    def init_fn(params):
        mu = jax.tree.map(lambda p: _store(jnp.zeros_like(p), p), params)
        nu = jax.tree.map(lambda p: _store(jnp.zeros_like(p), p), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def one(g, m, n):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            u = (m32 / c1) / (jnp.sqrt(n32 / c2) + eps)
            return u.astype(g.dtype), _store(m32, g), _store(n32, g)

        out = jax.tree.map(one, updates, state.mu, state.nu)
        new_updates = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=new_mu, nu=new_nu
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowp(
    learning_rate,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Optional[jnp.dtype] = jnp.bfloat16,
) -> optax.GradientTransformation:
    """AdamW with low-precision moment storage (same chain as
    ``optax.adamw``: adam scaling -> decoupled weight decay -> lr)."""
    return optax.chain(
        scale_by_adam_lowp(b1=b1, b2=b2, eps=eps, moment_dtype=moment_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
