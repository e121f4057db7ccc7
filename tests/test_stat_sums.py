"""moment_sums: one-pass [sum|x|, sum x^2, sum x] == the jnp reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.ops.stat_sums import moment_sums


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(64, 128), (3, 40, 256), (1000, 128)])
def test_moment_sums_matches_reference(dtype, shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    ref = moment_sums(x, impl="reference")
    out = moment_sums(x, impl="interpret")
    assert out.shape == (3, shape[-1]) and out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=1e-3,
    )


def test_moment_sums_zero_pad_rows_are_noops():
    # 72 rows -> padded to a block multiple internally; sums must be exact
    x = jnp.ones((72, 128), jnp.float32)
    out = moment_sums(x, impl="interpret")
    np.testing.assert_allclose(np.asarray(out), 72.0)
