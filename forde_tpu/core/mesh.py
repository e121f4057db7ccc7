"""Device mesh and sharding helpers.

The reference is strictly single-process/single-device (SURVEY.md §2.4: no
pmap/pjit/shard_map anywhere); parallelism here is new, TPU-first work.
Everything scales through one ``jax.sharding.Mesh`` with named axes:

  * ``data``    — data parallelism (batch dimension, contrastive all-gather)
  * ``expert``  — expert parallelism for MoE layers
  * ``context`` — context/sequence parallelism for long sequences (ring
                  attention; wired in the parallel/ package)
  * ``model``   — tensor (Megatron-style) parallelism: attention/expert
                  projections column/row-sharded; XLA inserts the
                  all-reduces from the GSPMD annotations (tp_param_spec)

A single chip is just the trivial 1x1x1x1 mesh, so every code path is
written against the mesh and degenerates gracefully.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_EXPERT = "expert"
AXIS_CONTEXT = "context"
AXIS_MODEL = "model"
AXIS_PIPE = "pipe"

ALL_AXES = (AXIS_DATA, AXIS_EXPERT, AXIS_CONTEXT, AXIS_MODEL, AXIS_PIPE)


def create_mesh(
    data: Optional[int] = None,
    expert: int = 1,
    context: int = 1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, expert, context, model, pipe) mesh over the
    available devices.

    If ``data`` is None it absorbs all devices not used by the other axes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    other = expert * context * model * pipe
    if data is None:
        if n % other != 0:
            raise ValueError(
                f"{n} devices not divisible by "
                f"expert*context*model*pipe={other}"
            )
        data = n // other
    if data * other != n:
        raise ValueError(
            f"mesh {data}x{expert}x{context}x{model}x{pipe} != {n} devices"
        )
    dev_array = np.asarray(devices).reshape(
        data, expert, context, model, pipe
    )
    return Mesh(dev_array, ALL_AXES)


def single_device_mesh() -> Mesh:
    """Trivial mesh over one device (the common single-chip case)."""
    return create_mesh(data=1, expert=1, context=1, devices=jax.devices()[:1])


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed for multi-host runs when the coordinator
    env is present (JAX_COORDINATOR_ADDRESS or the standard TPU pod env).

    Single-host is a no-op. This is the framework's whole distributed
    backend: XLA owns the collective layer over ICI/DCN once processes are
    joined (SURVEY.md §2.4 — no NCCL/MPI analog needed).
    """
    import os

    try:  # private, but the only pre-init "already joined?" probe
        from jax._src import distributed as jax_distributed

        if jax_distributed.global_state.client is not None:
            return True  # already initialized
    except (ImportError, AttributeError):
        pass  # jax moved the internals; fall through to initialize()
    # NOTE: must not touch jax.process_count()/jax.devices() here — any
    # backend-initializing call before jax.distributed.initialize() makes
    # the join impossible (initialize() raises).
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if addr:
        kw = {}
        # Explicit bootstrap (no cluster auto-detect env, e.g. the local
        # 2-process CPU test): coordinator + process_id/num_processes.
        if os.environ.get("JAX_NUM_PROCESSES"):
            if not os.environ.get("JAX_PROCESS_ID"):
                raise RuntimeError(
                    "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not — "
                    "explicit bootstrap needs JAX_COORDINATOR_ADDRESS, "
                    "JAX_NUM_PROCESSES, and a per-worker JAX_PROCESS_ID"
                )
            kw = dict(
                coordinator_address=addr,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
        return True
    return False


def create_mesh_for_batch(
    batch_size: int, expert: int = 1, context: int = 1, model: int = 1,
    pipe: int = 1,
) -> Mesh:
    """Mesh whose data axis divides ``batch_size``.

    Uses the largest data-axis size that divides both the batch and the
    available device count (dropping surplus devices rather than failing
    on tiny debug batches).
    """
    other = expert * context * model * pipe
    avail = len(jax.devices()) // other
    data = max(avail, 1)
    while data > 1 and batch_size % data != 0:
        data -= 1
    n = data * other
    total = len(jax.devices())
    if n < total:
        import warnings

        warnings.warn(
            f"create_mesh_for_batch: using {n}/{total} devices "
            f"(batch_size={batch_size} is not divisible by a larger data "
            f"axis with expert={expert}, context={context}, model={model}, "
            f"pipe={pipe}); {total - n} devices will sit idle",
            stacklevel=2,
        )
    return create_mesh(
        data=data, expert=expert, context=context, model=model, pipe=pipe,
        devices=jax.devices()[:n],
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(AXIS_DATA))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(k, B, ...) super-batches for fused multi-step training
    (train/clip_step.make_fused_step): the scan axis is unsharded, the
    batch axis shards over ``data``."""
    return NamedSharding(mesh, P(None, AXIS_DATA))


def tokens_sharding(mesh: Mesh) -> NamedSharding:
    """(B, S) token batches: batch over ``data``, sequence over
    ``context`` when context parallelism is active."""
    ctx = AXIS_CONTEXT if mesh.shape.get(AXIS_CONTEXT, 1) > 1 else None
    return NamedSharding(mesh, P(AXIS_DATA, ctx))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def expert_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (expert) dimension over the expert axis.

    Used for stacked MoE expert parameters of shape (E, ...).
    """
    return NamedSharding(mesh, P(AXIS_EXPERT))


# Tensor-parallel (Megatron-style) parameter layout, by module name.
# Column-parallel modules split their OUTPUT features over ``model``
# (the per-head/per-hidden slices compute independently); row-parallel
# modules split their INPUT features (XLA inserts the closing
# all-reduce). Suffix-based on the param path so it is insensitive to
# an (L,)-stacked leading dim under scan_layers.
_TP_COLUMN_PARALLEL = frozenset({
    "qkv_proj",            # fused attention in-projection (heads split)
    "topk_q_proj", "topk_k_proj", "topk_v_proj",
    "compressed_q_proj", "compressed_k_proj", "compressed_v_proj",
    "lm_head",             # vocab split; loss reduces with a collective
    "w_in",                # StatefulLayer up-projection (hidden split —
                           # the multiplex is elementwise over hidden)
})
_TP_ROW_PARALLEL = frozenset({
    "out_proj", "topk_out_proj", "compressed_out_proj",
    "w_out",               # StatefulLayer down-projection
})


def tp_param_spec(names: Sequence[str], leaf) -> Optional[tuple]:
    """Tensor-parallel dims for one param leaf, or None to leave it alone.

    ``names`` is the param path (module scopes + leaf name). Returns a
    tuple of PartitionSpec entries (same rank as ``leaf``) placing
    ``model`` on the split dim. Stacked MoE experts are column/row
    split on their hidden dim (w_up/w_down), composing with the
    ``expert`` axis which shards dim 0. The caller is responsible for
    checking the mesh's model-axis size and dim divisibility.
    """
    if not names or not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return None
    last = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    none = (None,) * leaf.ndim

    def _at(dim: int) -> tuple:
        spec = list(none)
        spec[dim] = AXIS_MODEL
        return tuple(spec)

    if last == "kernel" and parent in _TP_COLUMN_PARALLEL:
        return _at(-1)
    if last == "bias" and parent in _TP_COLUMN_PARALLEL:
        return _at(-1)
    if last == "kernel" and parent in _TP_ROW_PARALLEL:
        return _at(-2) if leaf.ndim >= 2 else None
    # int8 serving layout (ops/quant.QDense): kernel_q splits like its fp
    # kernel; per-out-channel scales follow the output dim (so they stay
    # replicated for row-parallel, where outputs are full-width partials)
    if last == "kernel_q" and parent in _TP_COLUMN_PARALLEL:
        return _at(-1)
    if last == "scale" and parent in _TP_COLUMN_PARALLEL:
        return _at(-1)
    if last == "kernel_q" and parent in _TP_ROW_PARALLEL:
        return _at(-2) if leaf.ndim >= 2 else None
    # row-parallel biases stay replicated (added after the all-reduce)
    if last == "w_up":
        return _at(-1)
    if last == "b_up":
        return _at(-1)
    if last == "w_down":
        return _at(-2) if leaf.ndim >= 2 else None
    # quantized expert bank: mirrors w_up/w_down; w_up per-channel scale
    # follows the hidden dim, w_down's stays replicated
    if last == "w_up_q":
        return _at(-1)
    if last == "w_up_scale":
        return _at(-1)
    if last == "w_down_q":
        return _at(-2) if leaf.ndim >= 2 else None
    return None


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along the data axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def logical_to_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def param_shardings(params, mesh: Mesh):
    """Derive NamedShardings for a parameter pytree.

    Policy (round 1): stacked expert parameters — leaves whose path contains
    an ``experts`` scope — are sharded on their leading (expert) dimension
    over the ``expert`` axis; everything else is replicated. The expert
    einsum dispatch then parallelizes under pjit with XLA-inserted
    collectives.
    """
    expert_axis = mesh.shape[AXIS_EXPERT]

    def leaf_sharding(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_expert = any("experts" == n for n in names)
        if (
            is_expert
            and expert_axis > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] % expert_axis == 0
        ):
            return NamedSharding(mesh, P(AXIS_EXPERT))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)
