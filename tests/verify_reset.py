"""Verification: the slow loop zeroes a hand-built mock stats buffer and
only touches router biases (reference tests/verify_reset.py:16-72)."""

import sys

import jax
import jax.numpy as jnp


class _Cfg:
    num_layers = 2
    num_experts = 4


def main() -> int:
    from forde_tpu.brain.slow_loop import moe_slow_loop_step

    params = {
        f"layer_{i}": {
            "moe": {"moe_layer": {"router": {"router_linear": {
                "kernel": jnp.ones((8, 4)), "bias": jnp.zeros(4)}}}},
            "attn": {"kernel": jnp.ones((8, 8))},
        }
        for i in range(2)
    }
    stats = {
        f"layer_{i}": {"moe": {
            "expert_usage": jnp.array([4.0, 3.0, 2.0, 1.0]),
            "step_count": jnp.array(10, jnp.int32),
        }}
        for i in range(2)
    }

    new_params, new_mv, diag = moe_slow_loop_step(
        params, {"stats_buffer": stats}, _Cfg(), jax.random.PRNGKey(0)
    )

    ok = True
    for leaf in jax.tree.leaves(new_mv["stats_buffer"]):
        if float(jnp.abs(leaf).sum()) != 0.0:
            print("FAILURE: stats buffer not zeroed")
            ok = False
    if int(diag["updates_count"]) != 2:
        print(f"FAILURE: expected 2 router bias updates, got {diag['updates_count']}")
        ok = False
    if float(jnp.abs(new_params["layer_0"]["attn"]["kernel"] - 1.0).sum()) != 0:
        print("FAILURE: non-router params were modified")
        ok = False

    print("SUCCESS: slow-loop reset + actuation verified" if ok else "FAILURE")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
