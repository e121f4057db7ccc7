"""Verification: the gradient tap recovers dL/dz statistics against a
hand-derived closed form (reference tests/reproduce_grad_sink.py:22-68,
which proved the sink pattern recovers dL/dy for an intermediate
activation; here the tap additionally reduces to stats in-backward)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from forde_tpu.nn.stateful import gradient_stats
    from forde_tpu.ops.stateful import grad_stat_tap

    # y = W z ; L = sum(y^2)/2  =>  dL/dz = W^T y  (closed form)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (8, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    slot = jnp.zeros((16, 2))

    def loss(z, slot):
        z_tapped = grad_stat_tap(z, slot)
        y = z_tapped @ w
        return 0.5 * jnp.sum(y**2)

    _, dslot = jax.grad(loss, argnums=(0, 1))(z, slot)
    dz_closed = (z @ w) @ w.T
    expected = gradient_stats(dz_closed)

    ok = np.allclose(np.asarray(dslot), np.asarray(expected), atol=1e-4)
    if ok:
        print("  ok: tap stats match closed-form dL/dz stats")
        print("SUCCESS: gradient tap verified")
    else:
        print("FAILURE: tap stats diverge from closed form")
        print("got:", np.asarray(dslot)[:3])
        print("want:", np.asarray(expected)[:3])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
