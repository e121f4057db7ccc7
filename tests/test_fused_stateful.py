"""The fused StatefulLayer (ops/fused_stateful.py, wired via
StatefulLayer impl="fused*") must be numerically equivalent to the legacy
composition (Dense -> grad tap -> stats -> multiplex -> Dense): outputs,
parameter/input gradients, activation statistics, and the gradient-stat
tap cotangents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import core

from forde_tpu.nn.stateful import StatefulLayer

B, S, DIN, F = 4, 24, 32, 64


def _setup(impl, key, assignments):
    layer = StatefulLayer(hidden_dim=F, d_model=DIN, impl=impl)
    x = jax.random.normal(key, (B, S, DIN))
    variables = layer.init(jax.random.PRNGKey(0), x)
    variables = core.unfreeze(variables)
    variables["brain"]["neuron_assignments"] = assignments
    return layer, x, variables


@pytest.mark.parametrize("fused_impl", ["fused_reference", "fused_interpret"])
def test_fused_matches_legacy(fused_impl):
    key = jax.random.PRNGKey(42)
    assignments = jnp.asarray(
        np.random.RandomState(0).randint(0, 3, (F,)), jnp.int32
    )

    results = {}
    for impl in ["reference", fused_impl]:
        layer, x, variables = _setup(impl, key, assignments)
        params = variables["params"]
        taps = jax.tree.map(jnp.zeros_like, variables["perturbations"])

        def loss_fn(params, taps, x):
            out, updates = layer.apply(
                {
                    "params": params,
                    "brain": variables["brain"],
                    "stats_buffer": variables["stats_buffer"],
                    "perturbations": taps,
                },
                x,
                mutable=["stats_buffer"],
            )
            return jnp.sum(out**2), (out, updates["stats_buffer"])

        (loss, (out, stats)), (gp, gt, gx) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(params, taps, x)
        results[impl] = dict(
            loss=loss, out=out, stats=stats, gp=gp, gt=gt, gx=gx
        )

    ref, fus = results["reference"], results[fused_impl]
    np.testing.assert_allclose(fus["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(fus["out"], ref["out"], atol=1e-5, rtol=1e-5)
    # activation stats (act_gini, act_gdp, act_var)
    for k in ("act_stats", "step_count"):
        np.testing.assert_allclose(
            jax.tree.leaves(fus["stats"])[0 if k == "act_stats" else 1],
            jax.tree.leaves(ref["stats"])[0 if k == "act_stats" else 1],
            atol=1e-5,
            rtol=1e-4,
        )
    # parameter + input grads
    for a, b in zip(jax.tree.leaves(fus["gp"]), jax.tree.leaves(ref["gp"])):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(fus["gx"], ref["gx"], atol=1e-5, rtol=1e-4)
    # grad-stat tap cotangents ([grad_gini, grad_gdp] per neuron)
    for a, b in zip(jax.tree.leaves(fus["gt"]), jax.tree.leaves(ref["gt"])):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_fused_param_tree_matches_legacy():
    """Param/collection trees must be identical so checkpoints, the brain
    loop's pytree surgery, and the train states are path-compatible."""
    key = jax.random.PRNGKey(1)
    a = jnp.zeros((F,), jnp.int32)
    _, _, v_ref = _setup("reference", key, a)
    _, _, v_fus = _setup("fused_reference", key, a)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(
        v_fus
    )
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(v_ref),
        jax.tree_util.tree_leaves_with_path(v_fus),
    ):
        assert pa == pb
        assert la.shape == lb.shape and la.dtype == lb.dtype


def test_fused_no_sense_path():
    layer = StatefulLayer(
        hidden_dim=F, d_model=DIN, impl="fused_reference", sense=False
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, DIN))
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert "perturbations" not in variables
    assert "stats_buffer" not in variables
    out = layer.apply(variables, x)
    assert out.shape == (B, S, DIN)
