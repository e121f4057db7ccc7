"""Sharded global-batch contrastive loss via shard_map + explicit
collectives.

Two roads to a global-batch InfoNCE on a data-parallel mesh:

  1. ``models.dual_encoder.clip_contrastive_loss`` under plain jit — XLA
     sees the cross-shard matmul and inserts an all-gather itself. Simplest
     and usually optimal on one slice.
  2. This module: shard_map with an explicit ``lax.all_gather`` of the
     (small) embedding tensors over ICI, then LOCAL-queries x GLOBAL-keys
     logits — the chunked formulation that keeps the (B_global, B_global)
     similarity matrix from ever materializing per device. This is the
     memory-safe path for the 32k-pair global batches of BASELINE.json
     config 4 (SURVEY.md §7.3: the full matrix at 32k is HBM-heavy).

Both are equivalence-tested against each other on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forde_tpu.core.mesh import AXIS_DATA
from forde_tpu.models.dual_encoder import l2_normalize


def _local_global_loss(
    img: jnp.ndarray, txt: jnp.ndarray, scale: jnp.ndarray, axis_name: str
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-shard body: local queries against all-gathered keys."""
    b_local = img.shape[0]
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)

    img = l2_normalize(img.astype(jnp.float32))
    txt = l2_normalize(txt.astype(jnp.float32))

    # Embeddings are tiny relative to activations; gather them over ICI.
    all_img = jax.lax.all_gather(img, axis_name, tiled=True)  # (B_global, D)
    all_txt = jax.lax.all_gather(txt, axis_name, tiled=True)

    labels = idx * b_local + jnp.arange(b_local)  # global positions

    # image -> text: local image queries vs global text keys
    logits_i = img @ all_txt.T * scale  # (B_local, B_global)
    loss_i = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits_i, axis=1), labels[:, None], axis=1
        )
    )
    # text -> image: local text queries vs global image keys
    logits_t = txt @ all_img.T * scale
    loss_t = -jnp.mean(
        jnp.take_along_axis(
            jax.nn.log_softmax(logits_t, axis=1), labels[:, None], axis=1
        )
    )
    # mean over shards == global mean (equal shard sizes)
    loss = jax.lax.pmean((loss_i + loss_t) / 2, axis_name)
    acc_i = jax.lax.pmean(
        jnp.mean(jnp.argmax(logits_i, axis=1) == labels), axis_name
    )
    return loss, {"contrastive/acc_img": acc_i}


def sharded_contrastive_loss(
    img_emb: jnp.ndarray,
    txt_emb: jnp.ndarray,
    logit_scale: jnp.ndarray,
    mesh: Mesh,
    max_scale: float = 100.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Global-batch symmetric InfoNCE with explicit ICI all-gather.

    ``img_emb``/``txt_emb`` are globally-(B, D) arrays sharded over the
    ``data`` axis on their leading dim.
    """
    scale = jnp.minimum(jnp.exp(logit_scale.astype(jnp.float32)), max_scale)
    fn = jax.shard_map(
        functools.partial(_local_global_loss, axis_name=AXIS_DATA),
        mesh=mesh,
        in_specs=(P(AXIS_DATA), P(AXIS_DATA), P()),
        out_specs=(P(), {"contrastive/acc_img": P()}),
    )
    return fn(img_emb, txt_emb, scale)
