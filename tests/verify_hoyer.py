"""Verification: Hoyer sparsity edge cases (reference tests/verify_hoyer.py:
zero vector -> 0, uniform -> 0, one-hot -> 1)."""

import sys

import jax.numpy as jnp


def main() -> int:
    from forde_tpu.brain.sensing import hoyer_sparsity

    checks = [
        ("zero vector -> 0", float(hoyer_sparsity(jnp.zeros(32))), 0.0, 1e-6),
        ("uniform -> 0", float(hoyer_sparsity(jnp.ones(32))), 0.0, 1e-5),
        (
            "one-hot -> 1",
            float(hoyer_sparsity(jnp.zeros(32).at[7].set(3.0))),
            1.0,
            1e-5,
        ),
        ("single element -> 0", float(hoyer_sparsity(jnp.array([5.0]))), 0.0, 1e-6),
    ]
    ok = True
    for name, got, want, tol in checks:
        if abs(got - want) > tol:
            print(f"FAILURE: {name}: got {got}")
            ok = False
        else:
            print(f"  ok: {name}")
    print("SUCCESS: Hoyer sparsity verified" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
