"""Standalone NSA branch modules (reference tests/test_moe.py:72-103 and
tests/test_topk_usage.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.nn.attention import NativeSparseAttention
from forde_tpu.nn.nsa_modules import CompressedGlobalAttention, TopKSelection
import pytest


@pytest.mark.slow
def test_nsa_shapes():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 64))
    nsa = NativeSparseAttention(
        num_heads=2, head_dim=32, window_size=16, compression_ratio=4,
        top_k_global=8, impl="reference",
    )
    variables = nsa.init(key, x)
    out = nsa.apply(variables, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_topk_selection_shapes_and_indices():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 32, 48))
    mod = TopKSelection(num_heads=2, head_dim=24, top_k=8)
    variables = mod.init(key, x)
    out, idx = mod.apply(variables, x)
    assert out.shape == x.shape
    assert idx.shape == (2, 8)
    assert int(idx.max()) < 32 and int(idx.min()) >= 0


def test_topk_selection_with_provided_scores():
    """Provided importance scores drive selection deterministically."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 16, 32))
    scores = jnp.arange(16.0)[None, :]  # highest at the end
    mod = TopKSelection(num_heads=2, head_dim=16, top_k=4)
    variables = mod.init(key, x, scores)
    _, idx = mod.apply(variables, x, scores)
    assert set(np.asarray(idx)[0]) == {15, 14, 13, 12}


def test_compressed_global_attention_short_context_zeros():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 32, 32))
    mod = CompressedGlobalAttention(num_heads=2, head_dim=16, compression_ratio=8)
    variables = mod.init(key, x, 16)
    out_short = mod.apply(variables, x, 4)  # local_window_start <= ratio
    np.testing.assert_array_equal(np.asarray(out_short), 0.0)
    out_long = mod.apply(variables, x, 16)
    assert float(jnp.abs(out_long).sum()) > 0


def test_nsa_short_sequence_gates_off_global_branches():
    """For S <= window the compressed/top-k contributions are hard-masked
    (reference sparse_attention.py:350, 362): output == local branch."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 16, 32))
    nsa = NativeSparseAttention(
        num_heads=2, head_dim=16, window_size=32, compression_ratio=4,
        top_k_global=8, impl="reference",
    )
    variables = nsa.init(key, x)
    out = nsa.apply(variables, x)

    from forde_tpu.nn.attention import SlidingWindowAttention

    local = SlidingWindowAttention(
        num_heads=2, head_dim=16, window_size=32, impl="reference"
    )
    local_out = local.apply(
        {"params": variables["params"]["local_attention"]}, x
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(local_out), atol=1e-5
    )
