"""MoE layer tests: shapes, gating invariants, dispatch-mode equivalence.

Mirrors the reference test intent (tests/test_moe.py:14-70) and adds the
capacity-dispatch vs dense-dispatch equivalence that the reference has no
analog for.
"""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.nn.moe import MoELayer, MoEStatefulLayer
from forde_tpu.ops import moe_dispatch


def test_moe_layer_shapes_and_probs():
    key = jax.random.PRNGKey(0)
    b, s, d = 2, 16, 64
    x = jax.random.normal(key, (b, s, d))
    moe = MoELayer(num_experts=4, top_k=2, expert_hidden_dim=128, d_model=d)
    variables = moe.init(key, x)
    out, aux, probs = moe.apply(variables, x)
    assert out.shape == (b, s, d)
    assert aux.shape == ()
    assert probs.shape == (b, s, 4)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    assert np.asarray(jnp.abs(out)).mean() > 0


def test_top_k_gating_matches_argsort():
    """lax.top_k picks the same expert set as argsort (reference
    tests/test_moe.py:40-70 regression)."""
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (4, 8, 6))
    idx, probs = moe_dispatch.top_k_gating(logits, 2)
    ref_idx = jnp.argsort(logits, axis=-1)[..., ::-1][..., :2]
    assert set(np.asarray(idx).reshape(-1, 2)[0]) == set(
        np.asarray(ref_idx).reshape(-1, 2)[0]
    )
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)


def test_capacity_dispatch_equals_dense_when_capacity_suffices():
    """With capacity >= tokens, capacity routing reproduces dense routing."""
    key = jax.random.PRNGKey(2)
    b, s, d = 2, 8, 32
    x = jax.random.normal(key, (b, s, d))
    dense = MoELayer(
        num_experts=4, top_k=2, expert_hidden_dim=64, d_model=d, dispatch="dense"
    )
    variables = dense.init(key, x)
    out_dense, aux_d, _ = dense.apply(variables, x)
    cap = MoELayer(
        num_experts=4,
        top_k=2,
        expert_hidden_dim=64,
        d_model=d,
        dispatch="capacity",
        capacity_factor=float(4),  # capacity = 4*T*k/E >= T
    )
    out_cap, aux_c, _ = cap.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_cap), atol=1e-5
    )
    np.testing.assert_allclose(float(aux_d), float(aux_c), atol=1e-6)


def test_capacity_route_drops_overflow():
    """Tokens beyond expert capacity contribute nothing (not garbage)."""
    t, k, e, c = 6, 1, 2, 2
    idx = jnp.zeros((t, k), dtype=jnp.int32)  # everyone picks expert 0
    probs = jnp.ones((t, k))
    plan = moe_dispatch.capacity_route(idx, probs, e, c)
    np.testing.assert_array_equal(
        np.asarray(plan["keep"][:, 0]), [True, True, False, False, False, False]
    )
    # expert 0 slots hold tokens 0 and 1; expert 1 empty
    np.testing.assert_array_equal(np.asarray(plan["slot_token"][0]), [0, 1])
    np.testing.assert_array_equal(
        np.asarray(plan["slot_valid"]), [[True, True], [False, False]]
    )
    # combine: dropped tokens produce exact zeros
    x = jnp.arange(t * 4, dtype=jnp.float32).reshape(t, 4) + 1.0
    expert_in = moe_dispatch.capacity_gather(x, plan)
    out = moe_dispatch.capacity_combine(expert_in, plan)
    np.testing.assert_allclose(np.asarray(out[:2]), np.asarray(x[:2]))
    np.testing.assert_array_equal(np.asarray(out[2:]), 0.0)


def test_capacity_route_slot_priority():
    """Slot 0 of every token outranks slot 1 of any token."""
    # two tokens, both list expert 0 in slot0; token0 also lists it... use:
    # token0 slot0->e0, token1 slot0->e0, token0 slot1->e0 impossible (top-k
    # unique); emulate priority with 3 tokens k=2 and capacity 2 on e0.
    idx = jnp.array([[0, 1], [0, 1], [1, 0]], jnp.int32)
    probs = jnp.ones((3, 2)) * 0.5
    plan = moe_dispatch.capacity_route(idx, probs, 2, 2)
    # expert 0 demand: t0.k0, t1.k0, t2.k1 -> slot-major order keeps t0,t1
    np.testing.assert_array_equal(np.asarray(plan["slot_token"][0]), [0, 1])
    assert not bool(plan["keep"][2, 1])


def test_stateful_layer_accumulates_stats():
    key = jax.random.PRNGKey(3)
    b, s, d = 2, 8, 32
    x = jax.random.normal(key, (b, s, d))
    layer = MoEStatefulLayer(num_experts=4, top_k=2, expert_hidden_dim=64, d_model=d)
    variables = layer.init(key, x)
    assert "stats_buffer" in variables
    buf0 = variables["stats_buffer"]
    assert int(buf0["step_count"]) == 0
    (out, aux), updates = layer.apply(variables, x, mutable=["stats_buffer"])
    buf1 = updates["stats_buffer"]
    assert int(buf1["step_count"]) == 1
    # expert_usage accumulates mean router probs: sums to ~1 per step.
    np.testing.assert_allclose(float(buf1["expert_usage"].sum()), 1.0, atol=1e-5)
