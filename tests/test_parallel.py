"""Multi-device tests on the 8-virtual-device CPU mesh: DP/EP sharded train
step, sharded contrastive loss vs single-device reference, graft dryrun."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.models.dual_encoder import clip_contrastive_loss
from forde_tpu.parallel.contrastive import sharded_contrastive_loss

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_mesh_creation_and_shapes():
    mesh = mesh_lib.create_mesh(expert=2)
    assert mesh.shape[mesh_lib.AXIS_DATA] == 4
    assert mesh.shape[mesh_lib.AXIS_EXPERT] == 2
    mesh2 = mesh_lib.create_mesh()
    assert mesh2.shape[mesh_lib.AXIS_DATA] == 8


def test_sharded_contrastive_matches_reference():
    mesh = mesh_lib.create_mesh()  # 8-way data parallel
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (32, 16))
    txt = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    scale_param = jnp.array(1.5)

    ref_loss, ref_m = clip_contrastive_loss(img, txt, scale_param)

    sharding = mesh_lib.batch_sharding(mesh)
    img_s = jax.device_put(img, sharding)
    txt_s = jax.device_put(txt, sharding)
    loss, m = sharded_contrastive_loss(img_s, txt_s, scale_param, mesh)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        float(m["contrastive/acc_img"]), float(ref_m["contrastive/acc_img"]),
        atol=1e-6,
    )


@pytest.mark.slow
def test_dp_ep_train_step_on_mesh():
    """Full decoder train step with batch on 'data' and experts on 'expert'."""
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """Same step, same numbers: sharded (4x data) vs fully replicated."""
    from forde_tpu.core.config import LLMConfig
    from forde_tpu.train.state import create_train_state, shard_train_state
    from forde_tpu.train.step import train_step

    cfg = LLMConfig(
        vocab_size=128, d_model=32, num_layers=1, num_heads=2, head_dim=16,
        max_seq_len=64, num_experts=2, top_k_experts=1, expert_hidden_dim=32,
        window_size=16, compression_ratio=4, top_k_global=8,
        use_hyper_connections=False, dropout_rate=0.0,
        attention_impl="reference",
    )
    rng = np.random.RandomState(0)
    batch_np = rng.randint(0, 128, (8, 32)).astype(np.int32)

    state1 = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0)
    _, m1 = train_step(state1, {"input_ids": jnp.asarray(batch_np)}, 1.0)

    mesh = mesh_lib.create_mesh(data=4, expert=2)
    state2 = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0)
    state2 = shard_train_state(state2, mesh)
    batch = {
        "input_ids": jax.device_put(batch_np, mesh_lib.batch_sharding(mesh))
    }
    _, m2 = train_step(state2, batch, 1.0)

    np.testing.assert_allclose(
        float(m1["loss/total"]), float(m2["loss/total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["training/grad_norm"]), float(m2["training/grad_norm"]),
        rtol=1e-4,
    )
