"""Evaluation CLI: perplexity of a checkpoint over a dataset.

The reference has no evaluation surface at all (training-only,
src/training/train.py — the tqdm loss is the closest thing). This CLI
loads a train.loop checkpoint (config from model_config.json; LoRA
checkpoints arrive merged, --use_ema serves the EMA weights) and reports
mean next-token cross-entropy + perplexity over N batches of a chosen
dataset — the same shifted-CE the train step optimizes, forward-only and
jitted once.

Usage:
  python -m forde_tpu.eval_lm --checkpoint_dir runs/ckpt \\
      --data_file corpus.txt --num_batches 50
  python -m forde_tpu.eval_lm --checkpoint_dir runs/ckpt --use_markov_data

Prints one JSON line: {"lm_loss": ..., "perplexity": ..., "aux_loss":
..., "batches": N, "tokens": T}.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FORDE decoder LM evaluation")
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="Orbax dir from train.loop (with model_config.json)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--lora_base_dir", type=str, default=None,
                   help="override a LoRA checkpoint's recorded base path")
    # data (same offline surfaces as the training CLI)
    p.add_argument("--data_file", type=str, default=None,
                   help=".npy token ids or raw text (byte-level ids; "
                        "--tokenizer gpt2 to tokenize instead)")
    p.add_argument("--tokenizer", choices=["byte", "gpt2"], default="byte")
    p.add_argument("--use_dummy_data", action="store_true")
    p.add_argument("--use_markov_data", action="store_true")
    p.add_argument("--markov_active_vocab", type=int, default=8192)
    p.add_argument("--markov_p", type=float, default=0.85)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--num_batches", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    return p


def evaluate(args) -> dict:
    from forde_tpu.data.lm import (
        create_dummy_dataset,
        create_lm_dataset,
        create_markov_dataset,
        create_text_file_dataset,
    )
    from forde_tpu.data.prefetch import prefetch_to_device
    from forde_tpu.train.checkpoint import load_lm_state
    from forde_tpu.train.step import eval_step

    config, state = load_lm_state(
        args.checkpoint_dir, init_seq_len=min(64, args.seq_len),
        lora_base_dir=args.lora_base_dir,
    )
    print(f"[eval] restored step {int(state.step)} from "
          f"{args.checkpoint_dir}")
    if args.use_ema:
        from forde_tpu.train.ema import swap_in_ema

        state = swap_in_ema(state)
        print("[eval] evaluating EMA weights")
    if args.seq_len > config.max_seq_len:
        raise ValueError(f"--seq_len {args.seq_len} exceeds the model's "
                         f"max_seq_len {config.max_seq_len}")

    if args.data_file:
        dataset = create_text_file_dataset(
            args.data_file, args.batch_size, args.seq_len,
            num_batches=args.num_batches, tokenizer=args.tokenizer,
            seed=args.seed,
        )
        if dataset.vocab_hint > config.vocab_size:
            raise ValueError(
                f"{args.data_file} has ids up to {dataset.vocab_hint - 1} "
                f">= model vocab {config.vocab_size}"
            )
    elif args.use_markov_data:
        dataset = create_markov_dataset(
            args.batch_size, args.seq_len, config.vocab_size,
            num_batches=args.num_batches,
            active_vocab=args.markov_active_vocab, p=args.markov_p,
            seed=args.seed,
        )
    elif args.use_dummy_data:
        dataset = create_dummy_dataset(
            args.batch_size, args.seq_len, config.vocab_size,
            num_batches=args.num_batches,
        )
    else:
        dataset = create_lm_dataset(
            args.batch_size, args.seq_len, num_batches=args.num_batches
        )

    losses, auxes = [], []
    n_tokens = 0
    for batch in prefetch_to_device(iter(dataset)):
        metrics = eval_step(state, batch)
        losses.append(float(metrics["loss/lm"]))
        auxes.append(float(metrics["loss/aux"]))
        n_tokens += int(batch["input_ids"].shape[0]) * (args.seq_len - 1)
    if not losses:
        raise ValueError("dataset produced no batches")
    lm = float(np.mean(losses))
    out = {
        "lm_loss": round(lm, 6),
        "perplexity": round(float(np.exp(lm)), 4),
        "aux_loss": round(float(np.mean(auxes)), 6),
        "batches": len(losses),
        "tokens": n_tokens,
    }
    print(json.dumps(out))
    return out


def main(argv: Optional[list] = None) -> None:
    evaluate(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
