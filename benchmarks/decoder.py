"""Decoder-LM training throughput: tokens/sec/chip.

Production-ish config: d_model 512, 12 layers, 8 experts top-2, NSA
window 512 at S=2048, mHC 4 streams, bf16 — the reference's default
LLMConfig scale (src/forde/model.py:39-69) that its laptop could never
train. Compares dense vs capacity MoE dispatch.

Run: python benchmarks/decoder.py
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


def bench(dispatch: str, batch: int = 8, seq: int = 2048, steps: int = 10):
    from forde_tpu.core.config import DTypePolicy, LLMConfig
    from forde_tpu.train.state import create_train_state
    from forde_tpu.train.step import train_step

    cfg = LLMConfig(
        vocab_size=50257,
        d_model=512,
        num_layers=12,
        num_heads=8,
        head_dim=64,
        max_seq_len=seq,
        num_experts=8,
        top_k_experts=2,
        expert_hidden_dim=2048,
        window_size=512,
        compression_ratio=8,
        top_k_global=64,
        num_streams=4,
        sinkhorn_iterations=5,
        dropout_rate=0.0,
        moe_dispatch=dispatch,
        # long-context runs (DECODER_SEQ > 2048) need scanned layers +
        # remat: the unrolled 12-layer compile and the per-layer
        # activations both blow up with S.
        scan_layers=seq > 2048,
        remat=seq > 2048,
        dtypes=DTypePolicy.bf16(),
    )
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 3e-4, 0.01, init_batch_shape=(1, seq)
    )
    rng = np.random.RandomState(0)
    b = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (batch, seq)))}
    for _ in range(2):
        state, m = train_step(state, b, aux_loss_weight=1.0)
    loss = float(m["loss/total"])
    assert np.isfinite(loss), loss
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = train_step(state, b, aux_loss_weight=1.0)
    float(m["loss/total"])
    dt = time.perf_counter() - t0
    tok_s = steps * batch * seq / dt / jax.device_count()
    print(
        f"moe_dispatch={dispatch}: {dt / steps * 1000:.1f} ms/step  "
        f"{tok_s:,.0f} tok/s/chip",
        flush=True,
    )
    return tok_s


def main():
    seq = int(os.environ.get("DECODER_SEQ", "2048"))
    batch = int(os.environ.get("DECODER_BATCH", "8"))
    results = {}
    for dispatch in ("dense", "capacity"):
        results[f"decoder_tokens_per_sec_per_chip_{dispatch}"] = round(
            bench(dispatch, batch=batch, seq=seq), 1
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
