"""Headline benchmark: image-text pairs/sec/chip for contrastive training.

Measures the full FORDE dual-encoder fast loop (forward + contrastive loss
+ backward + optimizer + activation/gradient sensing) at ViT-B/16 scale in
bfloat16 on the available chip(s), against the BASELINE.json north-star
target of 10,000 pairs/sec/chip on v5e.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env knobs: BENCH_PRESET (vit_b16|tiny), BENCH_BATCH, BENCH_STEPS.
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


def main() -> None:
    from forde_tpu.core.config import DTypePolicy, vit_b16_config, vit_tiny_config
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    preset = os.environ.get("BENCH_PRESET", "vit_b16")
    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    text_len = 64

    cfg = (vit_b16_config() if preset == "vit_b16" else vit_tiny_config())
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    if os.environ.get("BENCH_REMAT"):
        cfg = cfg.replace(remat=os.environ["BENCH_REMAT"])

    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=text_len,
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

    n_chips = jax.device_count()
    pairs_per_sec_per_chip = steps * batch_size / dt / n_chips
    assert np.isfinite(loss_sync), f"non-finite loss {loss_sync}"

    print(
        json.dumps(
            {
                "metric": f"image_text_pairs_per_sec_per_chip_{preset}_bf16",
                "value": round(pairs_per_sec_per_chip, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(
                    pairs_per_sec_per_chip / BASELINE_PAIRS_PER_SEC_PER_CHIP, 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
