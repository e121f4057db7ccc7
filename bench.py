"""Headline benchmark: image-text pairs/sec/chip for contrastive training.

Measures the full FORDE dual-encoder fast loop (forward + contrastive loss
+ backward + optimizer + activation/gradient sensing) in bfloat16 on the
available chip(s), against the BASELINE.json north-star target of 10,000
pairs/sec/chip on v5e.

By default runs BOTH production presets — ViT-B/16 (batch 128) as the
headline and ViT-Ti (batch 512, the scale where the 10k target is
physically reachable, see PERF.md roofline) — and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Adam moments are stored in bfloat16 (the production config —
train/optim.py halves optimizer HBM traffic, measured +2% step rate;
BENCH_MOMENT_DTYPE=float32 restores exact optax.adamw).

Env knobs: BENCH_PRESET (vit_b16|tiny|both), BENCH_BATCH, BENCH_STEPS,
BENCH_REMAT, BENCH_MOMENT_DTYPE.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC_PER_CHIP = 10_000.0
DEFAULT_BATCH = {"vit_b16": 128, "tiny": 512}


def run_preset(preset: str, batch_size: int, steps: int) -> float:
    from forde_tpu.core.config import DTypePolicy, vit_b16_config, vit_tiny_config
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    text_len = 64
    cfg = (vit_b16_config() if preset == "vit_b16" else vit_tiny_config())
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    if os.environ.get("BENCH_REMAT"):
        cfg = cfg.replace(remat=os.environ["BENCH_REMAT"])
    if os.environ.get("BENCH_ATTN_IMPL"):
        cfg = cfg.replace(attention_kernel_impl=os.environ["BENCH_ATTN_IMPL"])

    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=text_len,
        moment_dtype=os.environ.get("BENCH_MOMENT_DTYPE", "bfloat16") or None,
    )

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3),
            jnp.float32,
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (batch_size, text_len)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch_size, text_len), jnp.int32),
    }

    # Warmup / compile. NOTE: force completion with a host transfer
    # (float()); block_until_ready does not reliably synchronize through
    # the axon TPU tunnel.
    for _ in range(2):
        state, metrics = clip_train_step(state, batch)
    float(metrics["loss/contrastive"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = clip_train_step(state, batch)
    loss_sync = float(metrics["loss/contrastive"])
    dt = time.perf_counter() - t0

    assert np.isfinite(loss_sync), f"non-finite loss {loss_sync}"
    return steps * batch_size / dt / jax.device_count()


def main() -> None:
    preset = os.environ.get("BENCH_PRESET", "both")
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    presets = ["vit_b16", "tiny"] if preset == "both" else [preset]

    rates = {}
    for p in presets:
        batch = int(os.environ.get("BENCH_BATCH", DEFAULT_BATCH[p]))
        rates[p] = round(run_preset(p, batch, steps), 2)

    headline = presets[0]
    out = {
        "metric": f"image_text_pairs_per_sec_per_chip_{headline}_bf16",
        "value": rates[headline],
        "unit": "pairs/s/chip",
        "vs_baseline": round(
            rates[headline] / BASELINE_PAIRS_PER_SEC_PER_CHIP, 4
        ),
    }
    if len(rates) > 1:
        out["extra"] = {
            f"image_text_pairs_per_sec_per_chip_{p}_bf16": v
            for p, v in rates.items()
            if p != headline
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
