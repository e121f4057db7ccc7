"""Equivalence tests for the fused-qkv 3D flash attention
(ops/flash_attention.flash_mha) against the masked jnp reference path:
forward and gradients, with and without per-sample kv_lens (the
right-padded BERT text-tower contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.ops.flash_attention import flash_mha

B, S, H, D = 3, 64, 4, 64


def _qkv(key, dtype=jnp.float32, s=S):
    return jax.random.normal(key, (B, s, 3 * H * D), dtype) * 0.5


def _grads(fn, qkv):
    def loss(x):
        o = fn(x)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    return jax.grad(loss)(qkv)


@pytest.mark.slow
@pytest.mark.parametrize("kv_case", ["none", "lens"])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_mha_matches_reference(kv_case, causal):
    qkv = _qkv(jax.random.PRNGKey(0))
    kv_lens = (
        jnp.array([S, S // 2, 7], jnp.int32) if kv_case == "lens" else None
    )

    def run(impl):
        return flash_mha(
            qkv, H, D, causal=causal, kv_lens=kv_lens, impl=impl
        )

    ref = run("reference")
    out = run("interpret")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    # Gradient equivalence. With kv_lens, padded-query rows attend the
    # same masked keys in both paths, and the loss sums every row, so
    # grads must match everywhere.
    g_ref = _grads(lambda x: flash_mha(
        x, H, D, causal=causal, kv_lens=kv_lens, impl="reference"), qkv)
    g_out = _grads(lambda x: flash_mha(
        x, H, D, causal=causal, kv_lens=kv_lens, impl="interpret"), qkv)
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), atol=5e-5, rtol=5e-5
    )


@pytest.mark.slow
def test_flash_mha_unaligned_seq_pads():
    """S=50 (not a block multiple) pads internally and still matches."""
    qkv = _qkv(jax.random.PRNGKey(1), s=50)
    ref = flash_mha(qkv, H, D, impl="reference")
    out = flash_mha(qkv, H, D, impl="interpret")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    g_ref = _grads(lambda x: flash_mha(x, H, D, impl="reference"), qkv)
    g_out = _grads(lambda x: flash_mha(x, H, D, impl="interpret"), qkv)
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), atol=5e-5, rtol=5e-5
    )


def test_flash_mha_window_matches_4d_kernel():
    """Causal sliding-window parity with the 4D reference."""
    qkv = _qkv(jax.random.PRNGKey(2), s=128)
    ref = flash_mha(qkv, H, D, causal=True, window_size=32, impl="reference")
    out = flash_mha(qkv, H, D, causal=True, window_size=32, impl="interpret")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


@pytest.mark.slow
def test_flash_mha_zero_len_sample():
    """kv_lens[b] == 0 rows are ZERO (not mean-of-v) in forward, with zero
    grads, identically in the kernel and the reference path."""
    qkv = _qkv(jax.random.PRNGKey(3))
    kv_lens = jnp.array([S, 0, 1], jnp.int32)
    out = flash_mha(qkv, H, D, kv_lens=kv_lens, impl="interpret")
    ref = flash_mha(qkv, H, D, kv_lens=kv_lens, impl="reference")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    assert np.abs(np.asarray(out[1])).max() == 0.0  # zero-len sample zeroed
    g_out = _grads(
        lambda x: flash_mha(x, H, D, kv_lens=kv_lens, impl="interpret"), qkv
    )
    g_ref = _grads(
        lambda x: flash_mha(x, H, D, kv_lens=kv_lens, impl="reference"), qkv
    )
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), atol=5e-5, rtol=5e-5
    )
    assert np.abs(np.asarray(g_out[1])).max() == 0.0
