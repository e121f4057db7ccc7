"""Decode throughput: fp vs weight-only int8 serving (ops/quant.py).

Measures single-stream (batch 1) KV-cache decode tokens/sec on the real
chip at a weight-dominated scale — small-batch decoding is bound by
streaming the parameters from HBM every step, which is exactly what int8
weights halve (vs bf16; quarter vs fp32).

Usage (defaults: reference decoder scale, dense-causal):
  python benchmarks/quant_decode.py [--d_model 512] [--layers 12]
      [--new 128] [--moe] [--nsa]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from forde_tpu.core.config import DTypePolicy, LLMConfig
from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate_cached
from forde_tpu.ops.quant import quantize_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--new", type=int, default=128)
    p.add_argument("--prompt_len", type=int, default=32)
    p.add_argument("--moe", action="store_true")
    p.add_argument("--nsa", action="store_true")
    p.add_argument("--scan_layers", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    cfg = LLMConfig(
        vocab_size=50257,
        d_model=args.d_model,
        num_layers=args.layers,
        num_heads=args.heads,
        head_dim=args.d_model // args.heads,
        max_seq_len=2048,
        use_moe=args.moe,
        expert_hidden_dim=4 * args.d_model,
        use_sparse_attention=args.nsa,
        use_hyper_connections=False,
        dropout_rate=0.0,
        scan_layers=args.scan_layers,
        dtypes=DTypePolicy.bf16(),
    )
    model = FORDEDecoderLM(config=cfg)
    prompt = jnp.ones((1, args.prompt_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), prompt)
    # stats_buffer only exists when MoE is on; carry whatever non-param
    # collections init produced.
    extra = {k: v for k, v in variables.items() if k != "params"}
    qmodel = FORDEDecoderLM(config=cfg.replace(quantized=True))
    qvars = {"params": quantize_params(variables["params"]), **extra}

    def run(m, v, tag):
        out = generate_cached(
            m, v, prompt, jax.random.PRNGKey(0),
            max_new_tokens=args.new, temperature=0,
        )
        int(out[0, -1])  # force through the tunnel (sync)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = generate_cached(
                m, v, prompt, jax.random.PRNGKey(0),
                max_new_tokens=args.new, temperature=0,
            )
            int(out[0, -1])
            best = min(best, time.perf_counter() - t0)
        rate = args.new / best
        print(f"{tag}: {best * 1e3:.1f} ms for {args.new} tokens "
              f"= {rate:,.0f} tok/s (batch 1)")
        return rate

    fp = run(model, {"params": variables["params"], **extra}, "fp/bf16")
    q = run(qmodel, qvars, "int8   ")
    print(f"int8 speedup: {q / fp:.2f}x")


if __name__ == "__main__":
    main()
