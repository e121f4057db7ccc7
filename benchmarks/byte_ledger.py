"""Per-tensor byte ledger for the dual-encoder train step (VERDICT r2 #1).

Itemizes where the step's HBM bytes go, structurally (before XLA fusion):

  1. AD residuals: every tensor JAX AD saves between forward and backward
     of the contrastive loss (via jax._src.ad_checkpoint.saved_residuals),
     grouped by source line, sized in bytes. Each residual costs ~2x its
     size in HBM traffic (one write in fwd, one read in bwd) unless XLA
     remats it.
  2. Parameter-side traffic: params/grads/Adam moments read+write per
     step, as a function of the moment storage dtype.

Runs entirely on CPU with abstract values — no TPU time needed. Usage:

  python benchmarks/byte_ledger.py [--preset vit_b16] [--batch 128]
      [--remat mlp] [--moment_dtype bfloat16] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax._src.ad_checkpoint import saved_residuals


def human(n):
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:,.1f} {unit}"
        n /= 1024
    return f"{n:,.1f} TB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="vit_b16", choices=["vit_b16", "tiny"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--text_len", type=int, default=64)
    ap.add_argument("--remat", default="")
    ap.add_argument("--moment_dtype", default="")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from forde_tpu.core.config import (
        DTypePolicy,
        vit_b16_config,
        vit_tiny_config,
    )
    from forde_tpu.models.dual_encoder import FORDEDualEncoder
    from forde_tpu.train.clip_step import _loss_fn, create_clip_train_state

    cfg = vit_b16_config() if args.preset == "vit_b16" else vit_tiny_config()
    cfg = cfg.replace(dtypes=DTypePolicy.bf16(), forde_lite=False)
    if args.remat:
        cfg = cfg.replace(remat=args.remat)

    state = create_clip_train_state(
        cfg,
        jax.random.PRNGKey(0),
        1e-4,
        0.01,
        batch_size=args.batch,
        text_len=args.text_len,
        moment_dtype=args.moment_dtype or None,
    )
    batch = {
        "image": jnp.zeros(
            (args.batch, cfg.image_size, cfg.image_size, 3), jnp.float32
        ),
        "input_ids": jnp.zeros((args.batch, args.text_len), jnp.int32),
        "attention_mask": jnp.ones((args.batch, args.text_len), jnp.int32),
    }
    taps = jax.tree.map(jnp.zeros_like, state.perturbations)

    def loss_for_grad(params, taps):
        loss, _aux = _loss_fn(params, taps, state, batch)
        return loss

    print(f"# Byte ledger — {args.preset} batch={args.batch} "
          f"remat={args.remat or 'off'}")
    res = saved_residuals(loss_for_grad, state.params, taps)

    # ---- group by source line -------------------------------------------
    by_src = collections.Counter()
    count_by_src = collections.Counter()
    total = 0
    arg_bytes = 0
    for val, src in res:
        nbytes = val.size * val.dtype.itemsize
        total += nbytes
        s = str(src)
        if s.startswith("from the argument"):
            arg_bytes += nbytes
            continue
        # strip column info; keep op + file:line
        s = re.sub(r"/root/repo/", "", s)
        s = re.sub(r":\d+ \(", " (", s)  # drop column
        by_src[s] += nbytes
        count_by_src[s] += 1

    print(f"\ntotal residual bytes (excl. args): {human(total - arg_bytes)}")
    print(f"argument aliases (params/batch, no extra traffic): {human(arg_bytes)}")
    print(f"=> est. residual HBM traffic/step (write+read): "
          f"{human(2 * (total - arg_bytes))}\n")
    print(f"{'bytes':>12}  {'n':>3}  source")
    for s, b in by_src.most_common(args.top):
        print(f"{human(b):>12}  {count_by_src[s]:>3}  {s}")

    # ---- parameter-side traffic ------------------------------------------
    p_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(state.params)
    )
    m_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(state.opt_state)
    )
    print(f"\nparams: {human(p_bytes)}  (read fwd + read bwd + r/w update: "
          f"~{human(4 * p_bytes)}/step)")
    print(f"opt moments ({args.moment_dtype or 'fp32'}): {human(m_bytes)}  "
          f"(r+w: {human(2 * m_bytes)}/step)")
    print(f"grads: {human(p_bytes)} (w+r: {human(2 * p_bytes)}/step)")


if __name__ == "__main__":
    main()
