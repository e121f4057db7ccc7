"""Compiled-step cost analysis: FLOPs + HBM bytes for the clip train step.

Compiles the production ``clip_train_step`` for a preset and prints XLA's
``cost_analysis()`` (flops, bytes accessed) plus the implied roofline step
times on v5e (197 bf16 TFLOP/s, 819 GB/s HBM) — the ground truth for
whether the step is compute- or bandwidth-bound and how far from the
floor it runs (PERF.md "Headline"; VERDICT r2 #1 ledger).

Usage: python benchmarks/cost_probe.py [--preset vit_b16] [--batch 128]
       [--moment_dtype bfloat16] [--remat mlp]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--preset", default="vit_b16",
        choices=["vit_b16", "tiny", "tiny_hd128", "vit_b16_hd128"],
    )
    ap.add_argument("--batch", type=int, default=0, help="0 = preset default")
    ap.add_argument("--text_len", type=int, default=64)
    ap.add_argument("--moment_dtype", default="bfloat16")
    ap.add_argument("--remat", default="")
    args = ap.parse_args()

    from forde_tpu.core.config import (
        DTypePolicy,
        vit_b16_config,
        vit_b16_hd128_config,
        vit_tiny_config,
        vit_tiny_hd128_config,
    )
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    batch_size = args.batch or {
        "vit_b16": 128, "tiny": 512, "tiny_hd128": 512, "vit_b16_hd128": 128,
    }[args.preset]
    cfg = {
        "vit_b16": vit_b16_config,
        "tiny": vit_tiny_config,
        "tiny_hd128": vit_tiny_hd128_config,
        "vit_b16_hd128": vit_b16_hd128_config,
    }[args.preset]()
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    if args.remat:
        cfg = cfg.replace(remat=args.remat)

    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=args.text_len,
        moment_dtype=args.moment_dtype or None,
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (batch_size, args.text_len)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch_size, args.text_len), jnp.int32),
    }

    lowered = jax.jit(clip_train_step, donate_argnums=0).lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    out = {
        "preset": args.preset,
        "batch": batch_size,
        "moment_dtype": args.moment_dtype or "float32",
        "remat": args.remat or "off",
        "gflops_per_step": round(flops / 1e9, 1),
        "gb_accessed_per_step": round(bytes_acc / 1e9, 2),
        "roofline_compute_ms": round(flops / V5E_BF16_FLOPS * 1e3, 1),
        "roofline_hbm_ms": round(bytes_acc / V5E_HBM_BPS * 1e3, 1),
        "roofline_pairs_per_s": round(
            batch_size / max(flops / V5E_BF16_FLOPS, bytes_acc / V5E_HBM_BPS), 1
        ),
    }
    # per-category breakdown if available
    for k, v in sorted(ca.items()):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            out[k.replace(" ", "_")] = round(v / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
