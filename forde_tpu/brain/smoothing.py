"""Smoothing: convolutional mode-filter over assignment grids.

Parity target: reference src/forde/smoothing.py. The mode filter is
one-hot encode -> per-cluster box convolution -> argmax; the reference runs
a Python loop of ``jax.scipy.signal`` convolutions per cluster
(smoothing.py:72-78, 124-163). Here all clusters go through ONE
``lax.conv_general_dilated`` call with the cluster axis as the conv batch —
a single fused XLA op that maps straight onto the TPU conv units.

Padding behavior is reproduced exactly:
  * 2D: zero-pad (symmetric split) so each dim is >= kernel_size + 1, SAME
    convolution, crop (smoothing.py:56-86).
  * 3D: edge-pad dims smaller than kernel_size, SAME convolution, crop
    (smoothing.py:120-163).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


def assignments_to_grid(
    assignments: jnp.ndarray, grid_size: Tuple[int, int]
) -> jnp.ndarray:
    """Reshape 1D assignments into a 2D grid (reference smoothing.py:14-27)."""
    return assignments.reshape(grid_size)


def near_square_grid(n: int) -> Tuple[int, int]:
    """Largest-divisor near-square factorization (reference
    moe_slow_loop.py:337-340)."""
    h = int(n**0.5)
    while n % h != 0:
        h -= 1
    return h, n // h


def _box_filter(one_hot_cn: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """SAME box convolution over trailing spatial dims; input (C, *spatial)."""
    ndim = one_hot_cn.ndim - 1
    kernel = jnp.full(
        (1, 1) + (kernel_size,) * ndim,
        1.0 / kernel_size**ndim,
        dtype=jnp.float32,
    )
    x = one_hot_cn[:, None]  # (C, 1, *spatial): clusters ride the batch dim
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NC" + "DHW"[-ndim:], "OI" + "DHW"[-ndim:],
                                "NC" + "DHW"[-ndim:])
    )
    out = lax.conv_general_dilated(
        x.astype(jnp.float32), kernel, (1,) * ndim, "SAME", dimension_numbers=dn
    )
    return out[:, 0]


def smooth_assignments(
    assignment_grid: jnp.ndarray, kernel_size: int = 3, num_clusters: int = 3
) -> jnp.ndarray:
    """Mode-filter a 2D (H, W) assignment grid (reference smoothing.py:30-91)."""
    h, w = assignment_grid.shape
    pad_h = max(0, kernel_size + 1 - h)
    pad_w = max(0, kernel_size + 1 - w)
    lo_h, lo_w = pad_h // 2, pad_w // 2

    one_hot = jax.nn.one_hot(assignment_grid, num_clusters, axis=0)  # (C, H, W)
    one_hot = jnp.pad(
        one_hot,
        ((0, 0), (lo_h, pad_h - lo_h), (lo_w, pad_w - lo_w)),
        "constant",
    )
    density = _box_filter(one_hot, kernel_size)
    density = density[:, lo_h : lo_h + h, lo_w : lo_w + w]
    return jnp.argmax(density, axis=0)


def smooth_assignments_3d(
    assignment_grid: jnp.ndarray, kernel_size: int = 3, num_clusters: int = 3
) -> jnp.ndarray:
    """Mode-filter a 3D (D, H, W) grid, e.g. (layers-or-experts, gh, gw)
    (reference smoothing.py:94-171). Dims smaller than the kernel are
    edge-padded before the SAME convolution and cropped after."""
    d, h, w = assignment_grid.shape
    pads = [max(0, kernel_size - s) for s in (d, h, w)]
    los = [p // 2 for p in pads]

    one_hot = jax.nn.one_hot(assignment_grid, num_clusters, axis=0)  # (C, D, H, W)
    one_hot = jnp.pad(
        one_hot,
        ((0, 0),) + tuple((lo, p - lo) for lo, p in zip(los, pads)),
        "edge",
    )
    density = _box_filter(one_hot, kernel_size)
    density = density[
        :, los[0] : los[0] + d, los[1] : los[1] + h, los[2] : los[2] + w
    ]
    return jnp.argmax(density, axis=0)
