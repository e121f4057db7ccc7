"""Capture a device profile of the clip train step and print top ops.

Runs a few steps under ``jax.profiler.trace`` and converts the xplane
proto with tensorboard_plugin_profile into the framework-op-stats table,
printing the top ops by self time — the time-side complement of
benchmarks/cost_probe.py's byte ledger.

Usage: python benchmarks/profile_step.py [--preset vit_b16] [--batch 128]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="vit_b16", choices=["vit_b16", "tiny"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--outdir", default="")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from forde_tpu.core.config import DTypePolicy, vit_b16_config, vit_tiny_config
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    batch_size = args.batch or {"vit_b16": 128, "tiny": 512}[args.preset]
    cfg = vit_b16_config() if args.preset == "vit_b16" else vit_tiny_config()
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-4, 0.01,
        batch_size=batch_size, text_len=64, moment_dtype="bfloat16",
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.rand(batch_size, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (batch_size, 64)), jnp.int32
        ),
        "attention_mask": jnp.ones((batch_size, 64), jnp.int32),
    }

    for _ in range(3):
        state, metrics = clip_train_step(state, batch)
    float(metrics["loss/contrastive"])  # tunnel sync

    outdir = args.outdir or tempfile.mkdtemp(prefix="fordeprof_")
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(args.steps):
            state, metrics = clip_train_step(state, batch)
        float(metrics["loss/contrastive"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"measured {dt * 1e3:.1f} ms/step ({batch_size / dt:.0f} pairs/s)")

    xplanes = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        print(f"NO XPLANE under {outdir}")
        return
    xplane = max(xplanes, key=os.path.getmtime)
    print(f"xplane: {xplane}")

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("framework_op_stats", "tensorflow_stats", "op_profile"):
        try:
            data = rtd.xspace_to_tool_data([xplane], tool, {})
        except Exception as e:
            print(f"[{tool}] failed: {type(e).__name__}: {e}")
            continue
        if isinstance(data, tuple):
            data = data[0]
        out = os.path.join(outdir, f"{tool}.out")
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as f:
            f.write(data)
        print(f"[{tool}] wrote {out} ({len(data)} units)")
        break


if __name__ == "__main__":
    main()
