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
    ap.add_argument(
        "--preset", default="vit_b16",
        choices=["vit_b16", "tiny", "vit_b16_hd128", "tiny_hd128"],
    )
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--outdir", default="")
    ap.add_argument("--top", type=int, default=30)
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
        "vit_b16": 128, "tiny": 512, "vit_b16_hd128": 128, "tiny_hd128": 512,
    }[args.preset]
    cfg = {
        "vit_b16": vit_b16_config,
        "tiny": vit_tiny_config,
        "vit_b16_hd128": vit_b16_hd128_config,
        "tiny_hd128": vit_tiny_hd128_config,
    }[args.preset]()
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

    # tensorboard_plugin_profile is version-broken in this image; parse
    # the proto directly (and in a subprocess: the pure-python protobuf
    # fallback it may need must be set before protobuf first loads).
    import subprocess

    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "xplane_summary.py"),
         xplane, str(args.steps)],
        check=False,
    )


if __name__ == "__main__":
    main()
