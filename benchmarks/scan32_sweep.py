"""Round-5 sweep: close the last 3% to the 10.2k line under the
PRODUCTION fused shape (sense32 x scan32, tiny_hd128).

BENCH_r04/r05 initial put the sense32xscan32 median at ~9.87-10.0k
pairs/s/chip with ~+-2% day-to-day drift. The un-sensed step dominates
(31 of 32 steps), so the levers are whatever cuts ITS bytes:

  base        — bench.py's exact configuration (fp32 batch argument)
  bf16_batch  — feed the image batch in bf16, the dtype the production
                device pool actually stores (train/clip_loop.py round-4
                "bf16 image pool"); saves the per-step fp32 image read
  remat_mlp   — remat="mlp" (drops the StatefulLayer z residual
                write+read for one recompute matmul; a wash unfused at
                full sensing, re-tested under the scan where dispatch
                and sensing no longer mask it)
  batch 384/640 — knee re-check under the scan (the 512 knee was
                measured unfused at full sensing)

Usage (on chip): python benchmarks/scan32_sweep.py
Prints one JSON line per variant as it lands (flush), so partial runs
still yield data.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SENSE = 32
SCAN = 32


def run(batch_size: int, img_dtype, remat, reps: int = 1) -> list:
    from forde_tpu.core.config import DTypePolicy, vit_tiny_hd128_config
    from forde_tpu.train.clip_step import (
        clip_train_step,
        create_clip_train_state,
        make_nosense_step,
    )

    cfg = vit_tiny_hd128_config().replace(
        dtypes=DTypePolicy.bf16(), forde_lite=False, remat=remat
    )
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=64, moment_dtype="bfloat16",
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3), img_dtype
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (batch_size, 64)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch_size, 64), jnp.int32),
    }
    nosense = make_nosense_step(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch):
        def body(carry, _):
            s, m = clip_train_step(carry, batch)

            def inner(c, _):
                s2, m2 = nosense(c, batch)
                return s2, m2["loss/contrastive"]

            s, losses = jax.lax.scan(inner, s, None, length=SENSE - 1)
            return s, losses[-1]

        return jax.lax.scan(body, state, None, length=1)

    state, losses = multi_step(state, batch)  # compile
    float(losses[-1])
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(3):  # 3 dispatches x 32 steps
            state, losses = multi_step(state, batch)
        float(losses[-1])
        dt = time.perf_counter() - t0
        out.append(round(3 * SCAN * batch_size / dt, 2))
    return out


def main():
    variants = [
        ("base_512_f32", 512, jnp.float32, False),
        ("bf16batch_512", 512, jnp.bfloat16, False),
        ("remat_mlp_512", 512, jnp.float32, "mlp"),
        ("bf16_remat_512", 512, jnp.bfloat16, "mlp"),
        ("base_384_f32", 384, jnp.float32, False),
        ("base_640_f32", 640, jnp.float32, False),
        ("base_256_f32", 256, jnp.float32, False),
        ("base_320_f32", 320, jnp.float32, False),
        ("base_448_f32", 448, jnp.float32, False),
    ]
    only = os.environ.get("SWEEP_ONLY")
    reps = int(os.environ.get("SWEEP_REPS", "1"))
    for name, b, dt, rm in variants:
        if only and only not in name:
            continue
        try:
            rates = run(b, dt, rm, reps)
        except Exception as e:  # OOM etc. — record and continue
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "pairs_per_s_per_chip": rates}),
              flush=True)


if __name__ == "__main__":
    main()
