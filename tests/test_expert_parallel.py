"""Explicit shard_map EP vs single-device dense MoE with the same weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.nn.moe import MoELayer
from forde_tpu.parallel.expert_parallel import expert_parallel_moe

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(num_experts=4, d=32, h=64, b=8, s=16, top_k=2):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, s, d))
    dense = MoELayer(
        num_experts=num_experts, top_k=top_k, expert_hidden_dim=h, d_model=d,
        aux_loss_weight=1.0, dispatch="dense",
    )
    variables = dense.init(key, x)
    p = variables["params"]
    ep_params = {
        "router_kernel": p["router"]["router_linear"]["kernel"],
        "router_bias": p["router"]["router_linear"]["bias"],
        "w_up": p["experts"]["w_up"],
        "b_up": p["experts"]["b_up"],
        "w_down": p["experts"]["w_down"],
        "b_down": p["experts"]["b_down"],
    }
    return x, dense, variables, ep_params


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1)])
@pytest.mark.slow
def test_ep_matches_dense_moe(mesh_shape):
    data, expert = mesh_shape
    x, dense, variables, ep_params = _setup()
    out_ref, aux_ref, _ = dense.apply(variables, x)

    mesh = mesh_lib.create_mesh(data=data, expert=expert)
    x_s = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    ep_sharded = jax.tree.map(
        lambda v: jax.device_put(
            v,
            jax.sharding.NamedSharding(
                mesh,
                jax.sharding.PartitionSpec("expert")
                if v.ndim >= 2 and v.shape[0] == 4
                else jax.sharding.PartitionSpec(),
            ),
        ),
        ep_params,
    )
    out, aux = expert_parallel_moe(
        x_s, ep_sharded, mesh, num_experts=4, top_k=2,
        capacity_factor=8.0,  # capacity covers every token: no drops
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)

@pytest.mark.slow

@pytest.mark.slow
def test_ep_grads_flow():
    x, dense, variables, ep_params = _setup(b=8, s=8)
    mesh = mesh_lib.create_mesh(data=2, expert=4)
    x_s = jax.device_put(
        x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )

    def loss(params):
        out, aux = expert_parallel_moe(
            x_s, params, mesh, num_experts=4, top_k=2, capacity_factor=8.0
        )
        return jnp.sum(out**2) + aux

    grads = jax.grad(loss)(ep_params)
    for name, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), name
    assert float(jnp.abs(grads["w_up"]).sum()) > 0
