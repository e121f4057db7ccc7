"""Context parallelism for NSA (parallel/nsa_context.py): every helper and
the full training step must match the single-device path exactly.

Runs on the 8-virtual-device CPU mesh (conftest.py)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import DTypePolicy, LLMConfig
from forde_tpu.ops import attention_ref
from forde_tpu.parallel.nsa_context import (
    gather_pool_means_cp,
    small_kv_attention_cp,
    topk_select_cp,
    window_attention_cp,
)
from forde_tpu.train.state import create_train_state, shard_train_state
from forde_tpu.train.step import train_step

B, H, S, D = 2, 2, 64, 16
WINDOW = 8


def _mesh(context):
    return mesh_lib.create_mesh(
        data=1, context=context, devices=jax.devices()[:context]
    )


def _qkv(key):
    ks = jax.random.split(key, 3)
    return [
        jax.random.normal(k, (B, H, S, D), jnp.float32) * 0.5 for k in ks
    ]


class TestWindowAttentionCP:
    @pytest.mark.slow
    def test_matches_reference_fwd(self):
        q, k, v = _qkv(jax.random.PRNGKey(0))
        ref = attention_ref.sliding_window_attention_ref(q, k, v, WINDOW)
        for n in (2, 4):
            out = window_attention_cp(q, k, v, _mesh(n), WINDOW)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
            )

    @pytest.mark.slow
    def test_matches_reference_grads(self):
        q, k, v = _qkv(jax.random.PRNGKey(1))
        mesh = _mesh(4)

        def loss_cp(q, k, v):
            return jnp.sum(jnp.tanh(window_attention_cp(q, k, v, mesh, WINDOW)))

        def loss_ref(q, k, v):
            return jnp.sum(
                jnp.tanh(
                    attention_ref.sliding_window_attention_ref(q, k, v, WINDOW)
                )
            )

        g_cp = jax.grad(loss_cp, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_cp, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5
            )

    def test_shard_too_small_raises(self):
        import pytest

        q, k, v = _qkv(jax.random.PRNGKey(2))
        with pytest.raises(ValueError, match="window"):
            window_attention_cp(q, k, v, _mesh(4), window=32)


class TestPoolAndSelectCP:
    def test_pool_means_match(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (B, S, 24))
        ratio, num_pools = 4, (S - WINDOW) // 4
        ref = x[:, : num_pools * ratio].reshape(B, num_pools, ratio, 24).mean(
            axis=2
        )
        out = gather_pool_means_cp(x, _mesh(4), ratio, num_pools)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
        )

    def test_topk_select_matches(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (B, S, 24))
        idx = jnp.stack(
            [
                jnp.array([0, 17, 63, 31], jnp.int32),
                jnp.array([5, 5, 48, 16], jnp.int32),  # duplicate index OK
            ]
        )
        ref = x[jnp.arange(B)[:, None], idx]
        out = topk_select_cp(x, idx, _mesh(4))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6
        )

    @pytest.mark.slow
    def test_small_kv_attention_cp_matches(self):
        from forde_tpu.ops.nsa_attention import small_kv_attention

        q = jax.random.normal(jax.random.PRNGKey(5), (B, H, S, D))
        k = jax.random.normal(jax.random.PRNGKey(6), (B, H, 6, D))
        v = jax.random.normal(jax.random.PRNGKey(7), (B, H, 6, D))
        key_pos = jnp.tile(
            jnp.array([[0, 8, 16, 24, 40, 63]], jnp.int32), (B, 1)
        )
        ref = small_kv_attention(q, k, v, key_pos, impl="reference")
        out = small_kv_attention_cp(
            q, k, v, key_pos, _mesh(4), impl="reference"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


class TestNSAContextParallelTraining:
    """The flagship config trains under CP with losses matching 1 device
    (VERDICT r2 item 3)."""

    def _cfg(self):
        return LLMConfig(
            vocab_size=128,
            d_model=32,
            num_layers=2,
            num_heads=2,
            head_dim=16,
            max_seq_len=64,
            use_moe=False,
            use_sparse_attention=True,
            window_size=WINDOW,
            compression_ratio=4,
            top_k_global=4,
            use_hyper_connections=True,
            num_streams=2,
            sinkhorn_iterations=3,
            dropout_rate=0.0,
            attention_impl="reference",
            dtypes=DTypePolicy.fp32(),
        )

    def _run(self, mesh, model_mesh, batches):
        cfg = self._cfg()
        state = create_train_state(
            cfg, jax.random.PRNGKey(0), 1e-2, 0.0,
            init_batch_shape=(1, 16), mesh=model_mesh,
        )
        state = shard_train_state(state, mesh)
        sharding = mesh_lib.tokens_sharding(mesh)
        losses = []
        for b in batches:
            batch = {"input_ids": jax.device_put(b, sharding)}
            state, metrics = train_step(state, batch, aux_loss_weight=0.01)
            losses.append(float(metrics["loss/total"]))
        return losses

    @pytest.mark.slow
    def test_nsa_cp_matches_single_device(self):
        rng = np.random.RandomState(0)
        batches = [
            rng.randint(0, 128, (2, S)).astype(np.int32) for _ in range(2)
        ]
        mesh_cp = _mesh(4)
        mesh_1 = mesh_lib.create_mesh(data=1, devices=jax.devices()[:1])
        cp = self._run(mesh_cp, mesh_cp, batches)
        ref = self._run(mesh_1, None, batches)
        np.testing.assert_allclose(cp, ref, rtol=0, atol=2e-5)

    @pytest.mark.slow
    def test_nsa_dp_cp_compose(self):
        rng = np.random.RandomState(1)
        batches = [rng.randint(0, 128, (4, S)).astype(np.int32)]
        mesh = mesh_lib.create_mesh(
            data=2, context=4, devices=jax.devices()[:8]
        )
        losses = self._run(mesh, mesh, batches)
        assert all(np.isfinite(x) for x in losses)
