"""Embedding / retrieval CLI for the FORDE dual encoder.

The serving surface for the vision-language family (the reference is
training-only; its README describes the CLIP-style product,
README.md:22-66). Loads a ``forde_tpu.train.clip_loop`` checkpoint
(model config + train meta ride in the checkpoint dir) and embeds
images and/or token sequences with the tower entry points
(``FORDEDualEncoder.encode_image`` / ``encode_text``), printing the
cosine-similarity matrix — the retrieval primitive.

No-egress-friendly inputs: images as ``.npy`` arrays ((H, W, 3) float
in [0,1] or uint8), texts as raw token-id lists. Examples:

  python -m forde_tpu.embed --checkpoint_dir runs/clip_ckpt \\
      --image_npy img0.npy,img1.npy --text_ids "12,99,407;7,5"
  python -m forde_tpu.embed --checkpoint_dir runs/clip_ckpt \\
      --image_npy img.npy --out emb   # writes emb_image.npy/emb_text.npy
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FORDE dual-encoder embedding")
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="clip_loop checkpoint dir (carries model config)")
    p.add_argument("--image_npy", type=str, default=None,
                   help="comma-separated .npy image paths, each (H, W, 3) "
                        "float [0,1] or uint8 (resized center-cropless via "
                        "simple bilinear if the size differs)")
    p.add_argument("--text_ids", type=str, default=None,
                   help="semicolon-separated token-id sequences, e.g. "
                        '"12,99,407;7,5" (padded/truncated to max_text_len)')
    p.add_argument("--use_ema", action="store_true",
                   help="embed with the EMA weights (--ema_decay training)")
    p.add_argument("--out", type=str, default=None,
                   help="prefix: saves <out>_image.npy / <out>_text.npy")
    return p


def _load_state(checkpoint_dir: str):
    from forde_tpu.train.checkpoint import load_clip_state

    return load_clip_state(checkpoint_dir)


def _load_images(paths: str, size: int) -> np.ndarray:
    imgs = []
    for path in paths.split(","):
        arr = np.load(path.strip())
        assert arr.ndim == 3 and arr.shape[-1] == 3, (
            f"{path}: expected (H, W, 3), got {arr.shape}"
        )
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.shape[:2] != (size, size):
            arr = np.asarray(
                jax.image.resize(jnp.asarray(arr), (size, size, 3), "bilinear")
            )
        imgs.append(arr)
    return np.stack(imgs)


def _load_texts(spec: str, max_len: int, pad_id: int = 0):
    ids, mask = [], []
    for seq in spec.split(";"):
        toks = [int(t) for t in seq.split(",") if t.strip()][:max_len]
        ids.append(toks + [pad_id] * (max_len - len(toks)))
        mask.append([1] * len(toks) + [0] * (max_len - len(toks)))
    return np.asarray(ids, np.int32), np.asarray(mask, np.int32)


def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    assert args.image_npy or args.text_ids, (
        "give --image_npy and/or --text_ids"
    )
    from forde_tpu.models.dual_encoder import FORDEDualEncoder

    cfg, state = _load_state(args.checkpoint_dir)
    print(f"[embed] restored step {int(state.step)} "
          f"from {args.checkpoint_dir}")
    if args.use_ema:
        from forde_tpu.train.ema import swap_in_ema

        state = swap_in_ema(state)
        print("[embed] using EMA weights")

    model = FORDEDualEncoder(config=cfg.replace(sense=False))
    variables = {
        "params": state.params,
        "brain": state.brain,
        "stats_buffer": state.stats_buffer,
    }

    img_emb = txt_emb = None
    if args.image_npy:
        images = _load_images(args.image_npy, cfg.image_size)
        img_emb = np.asarray(jax.jit(
            lambda v, x: model.apply(v, x, method=model.encode_image)
        )(variables, jnp.asarray(images)))
        print(f"[embed] {img_emb.shape[0]} image embeddings, "
              f"dim {img_emb.shape[1]}")
    if args.text_ids:
        ids, mask = _load_texts(args.text_ids, cfg.max_text_len)
        txt_emb = np.asarray(jax.jit(
            lambda v, i, m: model.apply(
                v, i, m, method=model.encode_text
            )
        )(variables, jnp.asarray(ids), jnp.asarray(mask)))
        print(f"[embed] {txt_emb.shape[0]} text embeddings, "
              f"dim {txt_emb.shape[1]}")

    if img_emb is not None and txt_emb is not None:
        from forde_tpu.models.dual_encoder import l2_normalize

        sim = np.asarray(
            l2_normalize(jnp.asarray(img_emb))
            @ l2_normalize(jnp.asarray(txt_emb)).T
        )
        print("[embed] image x text cosine similarity:")
        for row in sim:
            print("  " + " ".join(f"{v:+.4f}" for v in row))
        print("[embed] best text per image:", sim.argmax(-1).tolist())
    if args.out:
        if img_emb is not None:
            np.save(f"{args.out}_image.npy", img_emb)
        if txt_emb is not None:
            np.save(f"{args.out}_text.npy", txt_emb)
        print(f"[embed] saved under prefix {args.out}")


if __name__ == "__main__":
    main()
