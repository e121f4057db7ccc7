"""Image<->text retrieval evaluation for the dual encoder.

Standard CLIP quality metric (recall@K both directions + mean/median rank)
computed over a held-out set of pairs — the reference has no evaluation
path at all. Embeddings are computed in batches on device; the similarity
ranking runs as one jitted computation.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.dual_encoder import l2_normalize
from forde_tpu.train.clip_step import CLIPTrainState, clip_eval_embeddings


@jax.jit
def _retrieval_ranks(img_emb: jnp.ndarray, txt_emb: jnp.ndarray):
    """Rank of the true match for every query, both directions."""
    img = l2_normalize(img_emb.astype(jnp.float32))
    txt = l2_normalize(txt_emb.astype(jnp.float32))
    sims = img @ txt.T  # (N, N)
    n = sims.shape[0]
    diag = jnp.diagonal(sims)
    # rank = number of candidates scoring strictly higher than the match
    rank_i2t = jnp.sum(sims > diag[:, None], axis=1)
    rank_t2i = jnp.sum(sims > diag[None, :], axis=0)
    return rank_i2t, rank_t2i


def retrieval_metrics(
    img_emb: jnp.ndarray,
    txt_emb: jnp.ndarray,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """recall@K / mean / median rank over (N, D) paired embeddings."""
    rank_i2t, rank_t2i = _retrieval_ranks(img_emb, txt_emb)
    out: Dict[str, float] = {}
    for name, ranks in (("i2t", rank_i2t), ("t2i", rank_t2i)):
        r = np.asarray(ranks)
        for k in ks:
            out[f"retrieval/{name}_recall@{k}"] = float((r < k).mean())
        out[f"retrieval/{name}_mean_rank"] = float(r.mean() + 1)
        out[f"retrieval/{name}_median_rank"] = float(np.median(r) + 1)
    return out


def evaluate_retrieval(
    state: CLIPTrainState,
    batches: Iterable[Dict],
    ks: Sequence[int] = (1, 5, 10),
    prefix: str = "",
) -> Dict[str, float]:
    """Embed every (image, caption) batch and compute retrieval metrics
    over the concatenated set. ``prefix`` namespaces the metric tags
    (e.g. "seen_" for held-out pairs of seen classes vs "unseen_" for
    held-out classes)."""
    imgs, txts = [], []
    for batch in batches:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        img, txt, _ = clip_eval_embeddings(state, batch)
        imgs.append(np.asarray(img))
        txts.append(np.asarray(txt))
    out = retrieval_metrics(
        jnp.asarray(np.concatenate(imgs)), jnp.asarray(np.concatenate(txts)), ks
    )
    if prefix:
        out = {
            k.replace("retrieval/", f"retrieval/{prefix}"): v
            for k, v in out.items()
        }
    return out
