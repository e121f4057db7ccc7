"""Isolate the patch-embedding cost: why does the ViT-B step trace show
a ~7 ms `convolution` bucket when the model has no conv?

The fast path computes patch embedding as reshape -> transpose -> Dense
(models/dual_encoder.py:49-54). XLA:TPU pattern-matches that dot (or its
input-gradient) back into a convolution; the round-4 xplane trace
attributes 7.0 ms/step (6%) to `convolution` at ~13 TF/s effective —
far below the MXU roofline for a (B*196, 768) x (768, 768) GEMM.

This probe times three formulations of the SAME math at ViT-B/128
scale, forward + backward (grads w.r.t. kernel only — the image is an
input, its gradient is never needed in training, and asking for it is
what invites the conv-transpose rewrite):

  transpose_dense  — the current model code
  einsum_direct    — one einsum over the 6-D patchify view, no
                     materialized transpose: bhpwqc,pqcd->b(hw)d
  cast_first       — current code but bf16-cast BEFORE the transpose
                     (halves the shuffle bytes: 154 MB -> 77 MB @128)

Prints one JSON line with ms/step for each and the HLO op kinds found
(to confirm whether `convolution` appears). Run on the chip:

    python benchmarks/patch_embed_probe.py
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

B, H, W, C, P, D = 128, 224, 224, 3, 16, 768
NH, NW = H // P, W // P
STEPS = 30


def transpose_dense(images, kernel):
    pt = images.reshape(B, NH, P, NW, P, C)
    pt = pt.transpose(0, 1, 3, 2, 4, 5).reshape(B, NH * NW, P * P * C)
    return pt.astype(jnp.bfloat16) @ kernel.astype(jnp.bfloat16)


def einsum_direct(images, kernel):
    pt = images.reshape(B, NH, P, NW, P, C).astype(jnp.bfloat16)
    k6 = kernel.reshape(P, P, C, D).astype(jnp.bfloat16)
    out = jnp.einsum("bhpwqc,pqcd->bhwd", pt, k6)
    return out.reshape(B, NH * NW, D)


def cast_first(images, kernel):
    pt = images.astype(jnp.bfloat16).reshape(B, NH, P, NW, P, C)
    pt = pt.transpose(0, 1, 3, 2, 4, 5).reshape(B, NH * NW, P * P * C)
    return pt @ kernel.astype(jnp.bfloat16)


def time_variant(fn, images, kernel):
    # Loss closes over a matmul consumer so the embed output is used the
    # way the tower uses it (keeps XLA from degenerate fusions), and the
    # grad is w.r.t. the kernel only.
    def loss(k):
        y = fn(images, k)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    step = jax.jit(jax.grad(loss))
    hlo = step.lower(kernel).compile().as_text()
    kinds = sorted(
        {
            op
            for op in ("convolution", "dot", "transpose", "copy")
            if f" {op}(" in hlo or f"= {op}" in hlo or (op + "(") in hlo
        }
    )
    g = step(kernel)
    float(jnp.sum(g))  # force through the tunnel
    t0 = time.perf_counter()
    for _ in range(STEPS):
        g = step(kernel)
    float(jnp.sum(g))
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    return round(ms, 3), kinds


def main():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, H, W, C), jnp.float32)
    kernel = jnp.asarray(rng.randn(P * P * C, D) * 0.02, jnp.float32)

    out = {}
    for name, fn in (
        ("transpose_dense", transpose_dense),
        ("einsum_direct", einsum_direct),
        ("cast_first", cast_first),
    ):
        ms, kinds = time_variant(fn, images, kernel)
        out[name] = {"ms_per_step": ms, "hlo_ops": kinds}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
