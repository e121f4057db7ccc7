"""Flash-attention kernel tuning sweep on the real chip.

Times forward+backward of the sliding-window kernel at the decoder's
production scale (B=4, H=8, S=2048, D=64, window 512, bf16) across
(block_q, block_k) and against the masked jnp reference (the round-1
kernel was only 1.5x the reference; PERF.md round-2 lead #4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from forde_tpu.ops.flash_attention import flash_attention


def bench(impl, block_q=128, block_k=128, window=512, s=2048, iters=30,
          dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (4, 8, s, 64), dtype)
    k = jax.random.normal(kk, (4, 8, s, 64), dtype)
    v = jax.random.normal(kv, (4, 8, s, 64), dtype)

    def f(q, k, v):
        o = flash_attention(
            q, k, v, causal=True, window_size=window, impl=impl,
            block_q=block_q, block_k=block_k,
        )
        return jnp.sum(o.astype(jnp.float32))

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))
    out = vg(q, k, v)
    float(out[0])  # compile + sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = vg(q, k, v)
    float(out[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    window = os.environ.get("SWEEP_WINDOW", "512")
    window = None if window in ("none", "None", "") else int(window)
    s = int(os.environ.get("SWEEP_S", "2048"))
    ref = bench("reference", window=window, s=s)
    print(f"masked reference fwd+bwd (window={window}, S={s}): {ref:.2f} ms")
    for bq in (128, 256, 512):
        for bk in (128, 256, 512):
            ms = bench("pallas", bq, bk, window=window, s=s)
            print(f"pallas bq={bq} bk={bk}: {ms:.2f} ms  ({ref / ms:.2f}x)")


if __name__ == "__main__":
    main()
