"""Equivalence tests for the fused NSA small-KV attention kernel
(ops/nsa_attention.py) against the reference masked-softmax math, forward
and backward, in interpret mode on CPU (the chip run is a verify step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.ops.nsa_attention import (
    small_kv_attention,
    small_kv_attention_ref,
)


def _inputs(b=2, h=2, s=96, kk=24, d=32, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kkk, kv, kp = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kkk, (b, h, kk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, kk, d), jnp.float32)
    key_pos = jax.random.randint(kp, (b, kk), 0, s)
    return q, k, v, key_pos


@pytest.mark.parametrize("shape", [
    dict(s=96, kk=24, d=32),     # pools-like, needs K padding (24 -> 24)
    dict(s=100, kk=13, d=48),    # ragged everything: S, K, D all padded
    dict(s=64, kk=64, d=64),     # aligned
])
def test_forward_matches_reference(shape):
    q, k, v, key_pos = _inputs(**shape)
    ref = small_kv_attention_ref(q, k, v, key_pos)
    out = small_kv_attention(q, k, v, key_pos, impl="interpret", block_q=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_uniform_fallback_quirk():
    """Queries before every key_pos get a UNIFORM distribution over real
    keys (the reference's -1e9 mask, sparse_attention.py:417-421) — and
    padding keys must NOT leak into that uniform."""
    b, h, s, kk, d = 1, 1, 8, 3, 32  # kk=3 pads to 8
    q, k, v, _ = _inputs(b=b, h=h, s=s, kk=kk, d=d)
    key_pos = jnp.full((b, kk), s + 100)  # every key is in the future
    ref = small_kv_attention_ref(q, k, v, key_pos)
    out = small_kv_attention(q, k, v, key_pos, impl="interpret", block_q=8)
    expect = jnp.broadcast_to(v.mean(axis=2, keepdims=True), ref.shape)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(expect), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_gradients_match_reference():
    q, k, v, key_pos = _inputs(s=80, kk=20, d=32)

    def loss_ref(q, k, v):
        o = small_kv_attention_ref(q, k, v, key_pos)
        return jnp.sum(o * jnp.cos(o))

    def loss_ker(q, k, v):
        o = small_kv_attention(
            q, k, v, key_pos, impl="interpret", block_q=16
        )
        return jnp.sum(o * jnp.cos(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_bf16_forward():
    q, k, v, key_pos = _inputs(s=64, kk=16, d=64)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = small_kv_attention_ref(q, k, v, key_pos)
    out = small_kv_attention(q, k, v, key_pos, impl="interpret", block_q=32)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
