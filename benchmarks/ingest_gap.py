"""Ingest-gap analysis: can the HOST actually feed the chip?

The north star (BASELINE.json) is 10k image-text pairs/s/chip with
"double-buffered on-device preprocessing". The model side is measured
(bench.py); this probe measures the FEEDING side and writes the gap
analysis down:

1. C++ batcher throughput vs thread count (fp32 and uint8 outputs), on
   mixed-size source images (256-512 px), the multicore scaling curve.
2. Transport budget: bytes/pair for fp32 vs uint8 at 224^2 — against
   both a datacenter host link (PCIe-class, ~10 GB/s) and THIS
   environment's ~20 MB/s axon tunnel.
3. On-device decode budget (--device): the u8->f32 normalize cost inside
   a jit, amortized into the step (the "on-device preprocessing" clause).

Prints one JSON line. CPU parts run anywhere; --device needs the chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMG = 224


def make_sources(n, seed=0):
    rng = np.random.RandomState(seed)
    sizes = rng.randint(256, 512, (n, 2))
    return [
        rng.randint(0, 256, (h, w, 3), np.uint8) for h, w in sizes
    ]


def bench_batcher(n_images=512, threads_list=(1, 2, 4, 8, 0)):
    from forde_tpu.data.native import (
        batch_resize_normalize, batch_resize_u8,
    )

    srcs = make_sources(n_images)
    out = {}
    for threads in threads_list:
        label = str(threads) if threads else "all"
        for name, fn in (("fp32", batch_resize_normalize),
                         ("u8", batch_resize_u8)):
            fn(srcs[:32], IMG, IMG, threads)  # warm the pool/page cache
            t0 = time.perf_counter()
            fn(srcs, IMG, IMG, threads)
            dt = time.perf_counter() - t0
            out.setdefault(name, {})[label] = round(n_images / dt, 1)
    return out


def transport_budget():
    fp32 = IMG * IMG * 3 * 4
    u8 = IMG * IMG * 3
    return {
        "bytes_per_pair_fp32": fp32,
        "bytes_per_pair_u8": u8,
        # pairs/s each link can carry at those encodings
        "axon_20MBps": {
            "fp32": round(20e6 / fp32, 1), "u8": round(20e6 / u8, 1),
        },
        "pcie_10GBps": {
            "fp32": round(10e9 / fp32, 1), "u8": round(10e9 / u8, 1),
        },
    }


def bench_device_decode(batch=512, steps=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def decode(u8):
        return u8.astype(jnp.bfloat16) / 255.0

    rng = np.random.RandomState(0)
    u8 = jnp.asarray(rng.randint(0, 256, (batch, IMG, IMG, 3), np.uint8))
    float(jnp.sum(decode(u8)))  # compile + sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = decode(u8)
    float(jnp.sum(out))
    ms = (time.perf_counter() - t0) / steps * 1e3
    return {"batch": batch, "ms_per_batch": round(ms, 3),
            "pairs_per_sec": round(batch / (ms / 1e3), 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", action="store_true",
                    help="also time the on-device u8->bf16 decode")
    ap.add_argument("--images", type=int, default=512)
    args = ap.parse_args()

    out = {
        "batcher_img_per_sec": bench_batcher(args.images),
        "transport": transport_budget(),
        "ncpu": os.cpu_count(),
    }
    if args.device:
        out["device_decode"] = bench_device_decode()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
