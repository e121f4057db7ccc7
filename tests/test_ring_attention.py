"""Ring attention (context parallelism) vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.core import mesh as mesh_lib
from forde_tpu.ops import attention_ref
from forde_tpu.parallel.ring_attention import ring_attention

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _qkv(s=64, b=2, h=2, d=32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, h, s, d)) for k in keys)


@pytest.mark.slow
@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_reference(causal):
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    q, k, v = _qkv(s=64)
    out = ring_attention(q, k, v, mesh, causal=causal)
    ref = (
        attention_ref.causal_attention_ref(q, k, v)
        if causal
        else attention_ref.mha_reference(q, k, v)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_attention_4way_context_with_data_parallel():
    """Mixed mesh: data=2 x context=4."""
    mesh = mesh_lib.create_mesh(data=2, expert=1, context=4)
    q, k, v = _qkv(s=32, b=4)
    out = ring_attention(q, k, v, mesh, causal=True)
    ref = attention_ref.causal_attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_attention_grads_match_reference():
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    q, k, v = _qkv(s=32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref.causal_attention_ref(q, k, v) ** 2)

    gr = jax.grad(loss_ring, (0, 1, 2))(q, k, v)
    ge = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, ge, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
def test_zigzag_matches_reference_8way():
    """The balanced causal schedule == single-device causal attention."""
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    q, k, v = _qkv(s=128)  # s_local 16 -> two 8-aligned half-chunks
    out = ring_attention(q, k, v, mesh, causal=True, schedule="zigzag")
    ref = attention_ref.causal_attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_zigzag_with_data_parallel_and_odd_ring():
    """data=2 x context=4 mesh; also covers the odd/even device split."""
    mesh = mesh_lib.create_mesh(data=2, expert=1, context=4)
    q, k, v = _qkv(s=64, b=4, seed=3)
    out = ring_attention(q, k, v, mesh, causal=True, schedule="zigzag")
    ref = attention_ref.causal_attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_zigzag_grads_match_reference():
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    q, k, v = _qkv(s=128, seed=7)

    def loss_zz(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh, causal=True, schedule="zigzag") ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(attention_ref.causal_attention_ref(q, k, v) ** 2)

    gr = jax.grad(loss_zz, (0, 1, 2))(q, k, v)
    ge = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b, n in zip(gr, ge, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=f"d{n}"
        )


@pytest.mark.slow
def test_zigzag_auto_selection():
    """auto picks zigzag only when causal and halves stay 8-aligned."""
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    # s_local=16: auto == explicit zigzag result
    q, k, v = _qkv(s=128, seed=1)
    a = ring_attention(q, k, v, mesh, causal=True, schedule="auto")
    z = ring_attention(q, k, v, mesh, causal=True, schedule="zigzag")
    np.testing.assert_allclose(np.asarray(a), np.asarray(z), atol=1e-6)
    # s_local=8 falls back to ring (halves would be 4-aligned)
    q, k, v = _qkv(s=64, seed=2)
    a = ring_attention(q, k, v, mesh, causal=True, schedule="auto")
    ref = attention_ref.causal_attention_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref), atol=2e-5)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh, causal=False, schedule="zigzag")


def test_ring_attention_rejects_indivisible_seq():
    mesh = mesh_lib.create_mesh(data=1, expert=1, context=8)
    q, k, v = _qkv(s=30)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mesh)
