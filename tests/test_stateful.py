"""StatefulLayer op + module tests: multiplex semantics, straight-through
gradient vs the analytic derivative, sensing accumulation."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.nn.stateful import StatefulLayer, activation_stats
from forde_tpu.ops.stateful import stateful_multiplex


def test_binary_step_forward_and_straight_through():
    """Specialist branch: hard threshold forward, straight-through grad
    (defined inside the multiplex custom-VJP, README.md:47-56)."""
    x = jnp.array([[-2.0, -0.1, 0.0, 0.1, 3.0]])
    spec = jnp.full((5,), 2, jnp.int32)  # all specialists
    # gate=0 isolates pure binary_step from the gated residual
    out = stateful_multiplex(x, spec, specialist_gate=0.0, impl="reference")
    np.testing.assert_array_equal(
        np.asarray(out[0]), [0.0, 0.0, 0.0, 1.0, 1.0]
    )
    g = jax.grad(
        lambda x: (
            stateful_multiplex(x, spec, 0.0, "reference") * jnp.arange(5.0)
        ).sum()
    )(x)
    # straight-through: d step(z)/dz == 1 everywhere
    np.testing.assert_array_equal(np.asarray(g[0]), np.arange(5.0))


def test_multiplex_semantics():
    """README.md:47-56: relu / tanh / binary_step by assignment; gated
    residual with specialist gate 0.1."""
    z = jnp.array([[-1.0, -1.0, -1.0], [2.0, 2.0, 2.0]])
    a = jnp.array([0, 1, 2], jnp.int32)
    out = stateful_multiplex(z, a, specialist_gate=0.1, impl="reference")
    # gen: relu(-1)+1*(-1) = -1 ; relu(2)+2 = 4
    # pool: tanh(-1)+(-1) ; tanh(2)+2
    # spec: step(-1)+0.1*(-1) = -0.1 ; step(2)+0.1*2 = 1.2
    expected = np.array(
        [
            [-1.0, np.tanh(-1.0) - 1.0, -0.1],
            [4.0, np.tanh(2.0) + 2.0, 1.2],
        ],
        np.float32,
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_multiplex_gradient_matches_analytic():
    """custom-VJP backward == the hand-derived derivative
    dout/dz = branch'(z) + gate (straight-through for specialists)."""
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (4, 24, 96))
    a = jax.random.randint(jax.random.PRNGKey(1), (96,), 0, 3)
    gate = 0.1

    def loss(z):
        return jnp.sum(stateful_multiplex(z, a, gate) ** 2)

    g = jax.grad(loss)(z)
    out = stateful_multiplex(z, a, gate)
    dfdz = jnp.where(
        a == 0,
        (z > 0).astype(z.dtype),
        jnp.where(a == 1, 1.0 - jnp.tanh(z) ** 2, 1.0),
    )
    gates = jnp.where(a == 2, gate, 1.0)
    expected = 2.0 * out * (dfdz + gates)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), atol=1e-5)


@pytest.mark.slow
def test_stateful_layer_collections_and_sensing():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16))
    layer = StatefulLayer(hidden_dim=32, d_model=16, impl="reference")
    variables = layer.init(key, x)
    assert set(variables) >= {"params", "brain", "stats_buffer", "perturbations"}
    assert variables["brain"]["neuron_assignments"].shape == (32,)
    assert variables["perturbations"]["z_tap"].shape == (32, 2)

    out, updates = layer.apply(variables, x, mutable=["stats_buffer"])
    assert out.shape == (2, 8, 16)
    buf = updates["stats_buffer"]
    assert int(buf["step_count"]) == 1
    assert buf["act_stats"].shape == (32, 3)
    assert float(jnp.abs(buf["act_stats"]).sum()) > 0

    # gradient tap: the slot cotangent is the (F, 2) grad-stat vector
    taps = {"z_tap": jnp.zeros((32, 2))}

    def f(taps):
        y = layer.apply(
            {
                "params": variables["params"],
                "brain": variables["brain"],
                "stats_buffer": variables["stats_buffer"],
                "perturbations": taps,
            },
            x,
            mutable=["stats_buffer"],
        )[0]
        return jnp.sum(y)

    tap_grad = jax.grad(f)(taps)["z_tap"]
    assert tap_grad.shape == (32, 2)
    assert float(jnp.abs(tap_grad).sum()) > 0


def test_grad_stat_tap_closed_form():
    """Tap cotangent == gradient stats of the true dL/dz (reproduce_grad_sink
    parity, but reduced in-backward)."""
    from forde_tpu.nn.stateful import gradient_stats
    from forde_tpu.ops.stateful import grad_stat_tap

    z = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
    slot = jnp.zeros((8, 2))

    def loss(z, slot):
        return jnp.sum(jnp.sin(grad_stat_tap(z, slot)))

    dz, dslot = jax.grad(loss, argnums=(0, 1))(z, slot)
    # identity on z: dz is cos(z)
    np.testing.assert_allclose(np.asarray(dz), np.cos(np.asarray(z)), atol=1e-6)
    expected = gradient_stats(jnp.cos(z))
    np.testing.assert_allclose(np.asarray(dslot), np.asarray(expected), atol=1e-5)


def test_assignments_change_function():
    """Rewriting the brain map changes the layer's actual function."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 16))
    layer = StatefulLayer(hidden_dim=32, d_model=16, impl="reference", sense=False)
    variables = layer.init(key, x)
    out0 = layer.apply(variables, x)
    new_brain = {"neuron_assignments": jnp.full((32,), 2, jnp.int32)}
    out2 = layer.apply({"params": variables["params"], "brain": new_brain}, x)
    assert float(jnp.abs(out0 - out2).max()) > 1e-3


def test_activation_stats_sparse_neuron():
    z = jnp.zeros((64, 8)).at[0, 0].set(10.0)
    s = activation_stats(z)
    assert float(s[0, 0]) > 0.9  # act_gini of the spiky neuron
    assert float(s[1, 0]) == 0.0  # silent neuron
