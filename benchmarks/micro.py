"""Micro-benchmarks mirroring the reference's own benchmark artifact
(benchmark_output_optimized.txt): MoE routing top-k, expert counting,
MoELayer forward, NativeSparseAttention forward — plus our kernel-level
comparisons (flash vs masked reference attention).

Reference numbers (developer laptop, BASELINE.md):
    argsort routing       20,054.6 ms      lax.top_k routing   734.2 ms
    one_hot+sum counting   1,033.1 ms      bincount counting     0.202 ms
    MoELayer forward           2.172 ms    NSA forward           7.387 ms

Run: python benchmarks/micro.py  (on the TPU chip). Prints a table and a
JSON blob; forces completion via host transfer (the axon tunnel does not
synchronize on block_until_ready).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_MS = {
    "routing_argsort": 20054.6,
    "routing_top_k": 734.2,
    "count_one_hot_sum": 1033.1,
    "count_bincount": 0.202,
    "moe_layer_forward": 2.172,
    "nsa_forward": 7.387,
}


def timeit(fn, *args, iters=50):
    """Time ``fn(*args)`` amortized over a lax.scan INSIDE one jit.

    Per-dispatch latency through the TPU tunnel is ~2ms, which would
    swamp sub-millisecond kernels if each call were dispatched from the
    host. The scan carries a scalar derived from each output back into
    the next input so XLA cannot hoist the body out of the loop.
    """

    @jax.jit
    def run(*args):
        def chain_in(t, c):
            if jnp.issubdtype(t.dtype, jnp.floating):
                return t + c.astype(t.dtype)
            if jnp.issubdtype(t.dtype, jnp.integer):
                # value-preserving data dependence: c is always 0 at
                # runtime but XLA cannot prove it.
                return t + c.astype(t.dtype)
            return t

        def body(c, _):
            xi = jax.tree.map(lambda t: chain_in(t, c), args)
            y = fn(*xi)
            leaf = jax.tree.leaves(y)[0]
            out = leaf.reshape(-1)[0].astype(jnp.float32)
            # tiny but data-dependent carry; rounds to 0 on the int path
            return out * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    out = run(*args)  # compile + warm
    _force(out)
    t0 = time.perf_counter()
    out = run(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[0]))


def main() -> None:
    # Shapes matching the reference's benchmark harness scale:
    # batch 8, seq 512, 8 experts, d_model 512 (moe.py defaults).
    b, s, d, e, k = 8, 512, 512, 8, 2
    key = jax.random.PRNGKey(0)
    results = {}

    # --- routing: argsort vs lax.top_k ---
    logits = jax.random.normal(key, (b, s, e))

    @jax.jit
    def route_argsort(lg):
        idx = jnp.argsort(lg, axis=-1)[..., ::-1][..., :k]
        vals = jnp.take_along_axis(lg, idx, axis=-1)
        return idx, jax.nn.softmax(vals, axis=-1)

    @jax.jit
    def route_top_k(lg):
        vals, idx = jax.lax.top_k(lg, k)
        return idx, jax.nn.softmax(vals, axis=-1)

    results["routing_argsort"] = timeit(route_argsort, logits)
    results["routing_top_k"] = timeit(route_top_k, logits)

    # --- expert counting: one_hot+sum vs bincount ---
    idx = jax.random.randint(jax.random.PRNGKey(1), (b * s * k,), 0, e)

    @jax.jit
    def count_one_hot(ix):
        return jax.nn.one_hot(ix, e).sum(axis=0)

    @jax.jit
    def count_bincount(ix):
        return jnp.bincount(ix, length=e)

    results["count_one_hot_sum"] = timeit(count_one_hot, idx)
    results["count_bincount"] = timeit(count_bincount, idx)

    # --- MoELayer forward (reference scale: 2x16x256, 4 experts) ---
    from forde_tpu.nn.moe import MoELayer

    x_small = jax.random.normal(key, (2, 16, 256))
    moe = MoELayer(num_experts=4, top_k=2, expert_hidden_dim=512, d_model=256)
    variables = moe.init(key, x_small)
    moe_fwd = jax.jit(lambda v, x: moe.apply(v, x)[0])
    results["moe_layer_forward"] = timeit(moe_fwd, variables, x_small)

    # --- NSA forward (reference scale: 2x128x256, window 32) ---
    from forde_tpu.nn.attention import NativeSparseAttention

    x_nsa = jax.random.normal(key, (2, 128, 256))
    nsa = NativeSparseAttention(
        num_heads=4, head_dim=64, window_size=32, compression_ratio=4,
        top_k_global=16,
    )
    nsa_vars = nsa.init(key, x_nsa)
    nsa_fwd = jax.jit(lambda v, x: nsa.apply(v, x))
    results["nsa_forward"] = timeit(nsa_fwd, nsa_vars, x_nsa)

    # --- flash vs masked-reference attention at production scale ---
    from forde_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(key, (4, 8, 2048, 64), jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 2048, 64), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 2048, 64), jnp.bfloat16)
    flash = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, causal=True, window_size=512,
                                        impl="pallas")
    )
    ref = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, causal=True, window_size=512,
                                        impl="reference")
    )
    results["flash_window_attn_2048"] = timeit(flash, q, kk, v)
    results["masked_ref_attn_2048"] = timeit(ref, q, kk, v)

    # Ops whose measured time is dominated by the ~2ms-per-iteration floor
    # of scan/dispatch overhead rather than the op itself: comparing them
    # against the reference's laptop numbers is not apples-to-apples.
    floor_ms = 1.0
    print(f"\n{'benchmark':<28}{'ours (ms)':>12}{'reference (ms)':>16}{'speedup':>10}")
    for name, ms in results.items():
        ref_ms = REFERENCE_MS.get(name)
        ref_str = f"{ref_ms:>16.3f}" if ref_ms else f"{'—':>16}"
        at_floor = ref_ms is not None and ms < floor_ms and ref_ms < floor_ms
        if ref_ms and at_floor:
            speedup = f"{'(floor)':>10}"
        elif ref_ms:
            speedup = f"{ref_ms / ms:>9.0f}x"
        else:
            speedup = f"{'—':>10}"
        print(f"{name:<28}{ms:>12.3f}{ref_str}{speedup}")
    print(
        "\nNOTE: rows marked (floor) are at the measurement floor on both "
        "sides — per-op latencies under ~1ms are dominated by dispatch/"
        "loop overhead here and by laptop overhead in the reference "
        "artifact; the comparison is not meaningful at that scale."
    )

    print("\n" + json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
