"""ViT-B head-geometry levers — round-3 follow-up to the tiny hd128 win.

At ViT-Ti, replacing three (S, 64) attention chains with one
lane-perfect (S, 128) chain bought +36% (benchmarks/tiny_levers.py,
PERF.md round-3). At ViT-B the same lever is *parameter-shape neutral*:
H·D stays 768 (vision) / 512 (text), so every projection matrix keeps
its exact CLIP ViT-B/16 shape — only the head split changes (12×64 →
6×128). Attention is a smaller share of ViT-B FLOPs (MLP 3072 wide),
so the expected win is smaller; this measures it.

Variants:
  base       — vision H=12 D=64, text H=8 D=64 (the headline preset)
  hd128      — vision H=6  D=128, text H=4 D=128 (same param shapes)
  hd128_vis  — hd128 vision tower only (text unchanged)

Usage: python benchmarks/vitb_levers.py [--steps 20] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tiny_levers import measure  # same harness, same sync discipline


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--only", default="", help="comma list (base,hd128,hd128_vis)")
    args = ap.parse_args()

    from forde_tpu.core.config import DTypePolicy, TowerConfig, vit_b16_config

    base = vit_b16_config().replace(dtypes=DTypePolicy.bf16())
    vis128 = TowerConfig(d_model=768, num_layers=12, num_heads=6,
                         head_dim=128, mlp_hidden_dim=3072)
    txt128 = TowerConfig(d_model=512, num_layers=12, num_heads=4,
                         head_dim=128, mlp_hidden_dim=2048)
    variants = {
        "base": (base, "vit_b16 base (12x64 / 8x64)"),
        "hd128": (base.replace(vision=vis128, text=txt128),
                  "vit_b16 hd128 (6x128 / 4x128)"),
        "hd128_vis": (base.replace(vision=vis128),
                      "vit_b16 hd128 vision only"),
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
