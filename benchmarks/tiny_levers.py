"""Tiny-preset (ViT-Ti) throughput levers — VERDICT r2 #2.

The tiny preset is bandwidth-bound at 88% of its byte floor (PERF.md
round-3 ledger: 3.56 TFLOP + 55.2 GB/step -> 67.5 ms HBM roofline,
measured ~77 ms). The two levers the round-2 study named but did not
measure:

  1. ``remat=mlp``  — recompute the StatefulLayer in the backward: drops
     its (B, S, F) z residual (write+read ~3.8 GB/step at tiny) for one
     extra matmul. Tiny has compute headroom (3.56 TFLOP = 18 ms at peak
     vs 67.5 ms of bytes), so the ViT-B result (remat lost 23%) need not
     transfer.
  2. head_dim=128 towers — fewer, lane-aligned matmuls per fused-MHA
     program (the kernel's per-head (200, 64) dots half-fill the MXU's
     128-lane contraction). Variants measured: H=1/D=128 (lane-perfect)
     and H=2/D=96.

Usage: python benchmarks/tiny_levers.py [--steps 30] [--batch 512]
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


def measure(cfg, batch_size: int, steps: int, label: str) -> float:
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=64, moment_dtype="bfloat16",
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "input_ids": jnp.asarray(rng.randint(1, cfg.vocab_size, (batch_size, 64)), jnp.int32),
        "attention_mask": jnp.ones((batch_size, 64), jnp.int32),
    }
    for _ in range(3):
        state, metrics = clip_train_step(state, batch)
    float(metrics["loss/contrastive"])  # tunnel sync
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = clip_train_step(state, batch)
    float(metrics["loss/contrastive"])
    dt = (time.perf_counter() - t0) / steps
    pps = batch_size / dt
    print(f"{label:34s} {dt * 1e3:7.1f} ms/step  {pps:8.0f} pairs/s/chip")
    return pps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument(
        "--only", default="",
        help="comma list of variants (base,remat,hd128,hd96,hd128_remat)",
    )
    args = ap.parse_args()

    from forde_tpu.core.config import (
        DTypePolicy,
        TowerConfig,
        vit_tiny_config,
        vit_tiny_hd128_config,
    )

    base = vit_tiny_config().replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    # the shipped preset itself, so this benchmark always measures what
    # bench.py ships (not a hand-copied twin that could drift)
    hd128 = vit_tiny_hd128_config().replace(
        dtypes=DTypePolicy.bf16(), forde_lite=False
    )
    hd96 = base.replace(
        vision=TowerConfig(d_model=192, num_layers=12, num_heads=2,
                           head_dim=96, mlp_hidden_dim=768),
        text=TowerConfig(d_model=192, num_layers=2, num_heads=2,
                         head_dim=96, mlp_hidden_dim=768),
    )
    variants = {
        "base": (base, "tiny base (H=3 D=64)"),
        "remat": (base.replace(remat="mlp"), "tiny + remat=mlp"),
        "hd128": (hd128, "tiny H=1 D=128"),
        "hd96": (hd96, "tiny H=2 D=96"),
        "hd128_remat": (hd128.replace(remat="mlp"), "tiny H=1 D=128 + remat=mlp"),
    }
    only = [v for v in args.only.split(",") if v]
    for key, (cfg, label) in variants.items():
        if only and key not in only:
            continue
        try:
            measure(cfg, args.batch, args.steps, label)
        except Exception as e:
            print(f"{label:34s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
