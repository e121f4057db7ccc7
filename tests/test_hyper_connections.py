"""mHC tests: Sinkhorn projection, stream expansion/mixing/collapse."""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.nn.hyper_connections import (
    HyperConnectionStream,
    ManifoldHyperConnection,
    StreamCollapser,
)
from forde_tpu.ops.sinkhorn import (
    sinkhorn_knopp,
    sinkhorn_knopp_exp,
    verify_doubly_stochastic,
)


def test_sinkhorn_doubly_stochastic():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (4, 4))
    for fn in (sinkhorn_knopp, sinkhorn_knopp_exp):
        m = fn(logits, num_iterations=10)
        assert verify_doubly_stochastic(m, tolerance=1e-3), fn.__name__
        assert bool(jnp.all(m >= 0))


def test_stream_expansion_identity_first():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 32))
    mod = HyperConnectionStream(num_streams=4, d_model=32)
    variables = mod.init(key, x)
    streams = mod.apply(variables, x)
    assert streams.shape == (2, 8, 4, 32)
    np.testing.assert_allclose(np.asarray(streams[:, :, 0]), np.asarray(x))


def test_mhc_mixing_preserves_shapes_and_injects_output():
    key = jax.random.PRNGKey(2)
    streams = jax.random.normal(key, (2, 8, 4, 32))
    sub = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32))
    mhc = ManifoldHyperConnection(num_streams=4, sinkhorn_iterations=5)
    variables = mhc.init(key, streams, sub)
    mixed, out = mhc.apply(variables, streams, sub)
    assert mixed.shape == streams.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mixed[:, :, 0]), atol=1e-6
    )
    # output stream = mixed streams + sublayer injection
    from forde_tpu.ops.sinkhorn import sinkhorn_knopp_exp

    m = sinkhorn_knopp_exp(variables["params"]["mixing_logits"], 5)
    expected = jnp.einsum("ij,bsjd->bsid", m, streams)[:, :, 0] + sub
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_stream_collapser_methods():
    key = jax.random.PRNGKey(4)
    streams = jax.random.normal(key, (2, 8, 4, 32))
    for method in ("weighted_sum", "concat", "first"):
        mod = StreamCollapser(d_model=32, collapse_method=method)
        variables = mod.init(key, streams)
        out = mod.apply(variables, streams)
        assert out.shape == (2, 8, 32), method
    # ones-init weights -> uniform softmax -> mean of streams
    mod = StreamCollapser(d_model=32, collapse_method="weighted_sum")
    variables = mod.init(key, streams)
    out = mod.apply(variables, streams)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(streams.mean(axis=2)), atol=1e-5
    )


def test_mhc_block_wrapper():
    """ManifoldHyperConnectionBlock: pre-norm + sublayer + mHC mixing."""
    from flax import linen as nn

    from forde_tpu.nn.hyper_connections import ManifoldHyperConnectionBlock

    key = jax.random.PRNGKey(5)
    streams = jax.random.normal(key, (2, 4, 3, 16))

    class Outer(nn.Module):
        @nn.compact
        def __call__(self, streams):
            dense = nn.Dense(16, name="sub")
            block = ManifoldHyperConnectionBlock(
                num_streams=3, sinkhorn_iterations=3, d_model=16
            )
            return block(streams, dense)

    outer = Outer()
    variables = outer.init(key, streams)
    new_streams, out = outer.apply(variables, streams)
    assert new_streams.shape == streams.shape
    assert out.shape == (2, 4, 16)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(new_streams[:, :, 0]), atol=1e-6
    )
