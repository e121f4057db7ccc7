"""Flash-attention kernel equivalence against the jnp reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.ops import attention_ref
from forde_tpu.ops.flash_attention import flash_attention


def _qkv(key, b=2, h=2, s=256, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), dtype)
    k = jax.random.normal(kk, (b, h, s, d), dtype)
    v = jax.random.normal(kv, (b, h, s, d), dtype)
    return q, k, v


def test_mask_semantics_match_reference():
    """Our mask builders reproduce the reference formulas exactly."""
    s, w = 17, 5
    rows = np.arange(s)[:, None]
    cols = np.arange(s)[None, :]
    ref_window = (rows - cols >= 0) & (rows - cols < w)
    np.testing.assert_array_equal(
        np.asarray(attention_ref.sliding_window_mask(s, w)), ref_window
    )
    np.testing.assert_array_equal(
        np.asarray(attention_ref.causal_mask(s)), np.tril(np.ones((s, s), bool))
    )


@pytest.mark.parametrize("window", [None, 64, 128])
def test_flash_forward_matches_reference(window):
    q, k, v = _qkv(jax.random.PRNGKey(0))
    out_ref = (
        attention_ref.sliding_window_attention_ref(q, k, v, window)
        if window
        else attention_ref.causal_attention_ref(q, k, v)
    )
    out = flash_attention(q, k, v, causal=True, window_size=window, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


def test_flash_forward_unaligned_seq():
    """Sequence not divisible by block size: padding must not leak."""
    q, k, v = _qkv(jax.random.PRNGKey(1), s=200)
    out_ref = attention_ref.sliding_window_attention_ref(q, k, v, 64)
    out = flash_attention(
        q, k, v, causal=True, window_size=64, impl="interpret", block_q=128, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)


@pytest.mark.parametrize("window", [None, 64])
def test_flash_backward_matches_reference(window):
    q, k, v = _qkv(jax.random.PRNGKey(2), s=128)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, window_size=window, impl="interpret")
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = (
            attention_ref.sliding_window_attention_ref(q, k, v, window)
            if window
            else attention_ref.causal_attention_ref(q, k, v)
        )
        return jnp.sum(o * jnp.cos(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, err_msg=f"d{name}"
        )


@pytest.mark.slow
def test_streaming_long_context_kernels_match_reference(monkeypatch):
    """The streaming (S > LONG_SEQ_THRESHOLD) kernels — scratch-carried
    online softmax, window-relative block maps, no full-S VMEM residents —
    must match the masked reference exactly like the resident kernels."""
    from forde_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "LONG_SEQ_THRESHOLD", 256)
    for causal, window in [(True, 128), (True, None)]:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (2, 2, 512, 64), jnp.float32)
        k = jax.random.normal(kk, (2, 2, 512, 64), jnp.float32)
        v = jax.random.normal(kv, (2, 2, 512, 64), jnp.float32)

        def f(q, k, v, impl):
            o = fa.flash_attention(
                q, k, v, causal=causal, window_size=window, impl=impl,
                block_q=128, block_k=128,
            )
            return jnp.sum(o**2)

        g1 = jax.grad(lambda *a: f(*a, "interpret"), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: f(*a, "reference"), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
            )


@pytest.mark.slow
def test_flash_lse_merge_invariant():
    """(o, lse) over two disjoint key halves merge exactly into full
    attention — the invariant ring attention is built on — and the lse
    cotangent path differentiates correctly (vs autodiff of the jnp
    composition)."""
    from forde_tpu.ops.flash_attention import flash_attention_with_lse

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 2, 64, 64), jnp.float32)
    k = jax.random.normal(kk, (2, 2, 128, 64), jnp.float32)
    v = jax.random.normal(kv, (2, 2, 128, 64), jnp.float32)

    def merged(q, k, v, impl):
        o1, l1 = flash_attention_with_lse(
            q, k[:, :, :64], v[:, :, :64], causal=False, impl=impl
        )
        o2, l2 = flash_attention_with_lse(
            q, k[:, :, 64:], v[:, :, 64:], causal=False, impl=impl
        )
        m = jnp.maximum(l1, l2)
        w1, w2 = jnp.exp(l1 - m), jnp.exp(l2 - m)
        return (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / (
            w1 + w2
        )

    from forde_tpu.ops import attention_ref

    full = attention_ref.mha_reference(q, k, v)
    for impl in ("reference", "interpret"):
        np.testing.assert_allclose(
            np.asarray(merged(q, k, v, impl)), np.asarray(full),
            atol=2e-5, rtol=2e-5,
        )

    # gradient through the merge (exercises the lse cotangent)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(merged(q, k, v, "reference") ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ker = jax.grad(
        lambda q, k, v: jnp.sum(merged(q, k, v, "interpret") ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )
