"""Per-neuron moment sums for the FORDE sensing loop.

The fast-loop statistics (reference README.md:57-63; activation Hoyer
gini / GDP / variance and their gradient twins) need three column-wise
reductions over the same (N, F) activation tensor: sum|z|, sum z^2,
sum z. XLA emits them as three separate reduction passes over z
(~12.5 ms of the 81 ms ViT-Ti step across 14 StatefulLayers, profiled).

A single-pass Pallas kernel was built to read z once — and measured a
large NET REGRESSION at ViT-Ti (6,658 -> 4,378 pairs/s with 28 stat
kernels/step): each pallas custom-call is a scheduling barrier in the
step's async pipeline, so while it reads 3x fewer bytes it serializes
against the surrounding matmuls that XLA's own reduction fusions overlap
with. The default therefore stays the XLA path ("reference"); the kernel
remains selectable (impl="pallas" / FORDE_MOMENT_IMPL) for future
re-measurement on other topologies.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, out_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    f = x.shape[-1]
    l1 = jnp.sum(jnp.abs(x), axis=0, keepdims=True)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    sm = jnp.sum(x, axis=0, keepdims=True)
    part = jnp.concatenate(
        [l1, sq, sm, jnp.zeros((5, f), jnp.float32)], axis=0
    )

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += part


def _block_rows(f: int, itemsize: int) -> int:
    # x tile + fp32 working copies, double-buffered, well under ~16MB.
    rows = (4 * 1024 * 1024) // max(f * (itemsize + 4), 1)
    return max(8, min(1024, rows // 8 * 8))


def moment_sums(x: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """(sum|x|, sum x^2, sum x) over all leading axes; x (..., F) ->
    (3, F) fp32, in ONE read of x.

    ``impl``: "auto" (Pallas on TPU, jnp elsewhere), "pallas",
    "interpret", "reference".
    """
    f = x.shape[-1]
    x2d = x.reshape(-1, f)
    if impl == "auto":
        # XLA reductions overlap with surrounding compute; the pallas
        # kernel does not (module docstring) — measured faster on v5e.
        impl = os.environ.get("FORDE_MOMENT_IMPL", "reference")
    if impl == "reference":
        xf = x2d
        return jnp.stack(
            [
                jnp.sum(jnp.abs(xf), axis=0, dtype=jnp.float32),
                jnp.sum(xf * xf, axis=0, dtype=jnp.float32),
                jnp.sum(xf, axis=0, dtype=jnp.float32),
            ],
            axis=0,
        )
    if impl == "variadic":
        # One variadic lax.reduce: XLA fuses the elementwise abs/square
        # into a SINGLE pass over x (vs three separate reduction fusions).
        # CPU-verified; on the v5e remote compiler a step full of these
        # never finished compiling (>>10 min) — do not default to it.
        xf = x2d.astype(jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        l1, sq, sm = jax.lax.reduce(
            (jnp.abs(xf), xf * xf, xf),
            (zero, zero, zero),
            lambda acc, val: tuple(a + v for a, v in zip(acc, val)),
            dimensions=(0,),
        )
        return jnp.stack([l1, sq, sm], axis=0)
    n = x2d.shape[0]
    block_n = _block_rows(f, x2d.dtype.itemsize)
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        x2d = jnp.pad(x2d, ((0, n_pad - n), (0, 0)))  # zero rows: no-op sums
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // block_n,),
        in_specs=[pl.BlockSpec((block_n, f), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, f), jnp.float32),
        interpret=(impl == "interpret"),
    )(x2d)
    return out[:3]
