"""Decode step-time vs max_decode_len — VERDICT r2 #6 ("Done = decode
memory/step-time flat in max_decode_len, measure at 2048 vs 16384").

Round 2's NSA decode caches allocated (B, H, max_decode_len, D) for the
local branch and masked the full buffer every step — O(max_decode_len)
work per token. Round 3 made the local branch a true ring buffer of
window_size K/V rows (nn/attention.py SlidingWindowCache), so per-step
attention work is bounded by window/K. The remaining
max_decode_len-dependent term is the compressed branch's pool cache
((max_decode_len // ratio) means), which is ratio-times smaller.

This benchmark decodes the SAME number of new tokens from the same
prompt under max_seq_len (== max_decode_len) 2048 and 16384 and reports
per-token latency for both. Flat-ish ratio (<< 8x for the 8x buffer) is
the pass criterion; memory scales with the buffers actually allocated.

Usage: python benchmarks/decode_scaling.py [--new 128] [--layers 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def measure(max_len: int, layers: int, new_tokens: int, nsa: bool) -> float:
    from forde_tpu.core.config import create_default_config
    from forde_tpu.models.decoder_lm import FORDEDecoderLM
    from forde_tpu.models.generate import generate_cached
    from forde_tpu.train.state import create_train_state

    cfg = create_default_config().replace(
        d_model=256, num_layers=layers, num_heads=4,
        use_sparse_attention=nsa, window_size=512,
        max_seq_len=max_len, scan_layers=True, dropout_rate=0.0,
    )
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.0, init_batch_shape=(1, 64),
    )
    variables = {"params": state.params, "stats_buffer": state.stats_buffer}
    model = FORDEDecoderLM(config=cfg)
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(1, 1000, (1, 64)), jnp.int32
    )

    def run():
        out = generate_cached(
            model, variables, prompt, jax.random.PRNGKey(1),
            max_new_tokens=new_tokens, temperature=0.0,
        )
        return np.asarray(out)  # host sync (tunnel-safe)

    run()  # compile
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    ms_tok = dt / new_tokens * 1e3
    print(f"max_decode_len={max_len:6d}  {ms_tok:6.2f} ms/token "
          f"({new_tokens} tokens in {dt:.2f} s)")
    return ms_tok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--no_nsa", action="store_true")
    args = ap.parse_args()

    a = measure(2048, args.layers, args.new, not args.no_nsa)
    b = measure(16384, args.layers, args.new, not args.no_nsa)
    print(f"ratio 16384/2048: {b / a:.2f}x  "
          f"(O(max_decode_len) masking would approach ~8x)")


if __name__ == "__main__":
    main()
