"""Resumable shard-wise VL dataset download.

Modern equivalent of the reference's Conceptual Captions downloader
(src/data/download_to_drive.py): stream (image, caption) pairs, preprocess
to the training contract (224x224x3 float32 + padded BERT tokens), and
save fixed-size shards with:

  * resumable shard scan — restart continues after the last complete shard
    (reference :78-103),
  * KeyboardInterrupt partial-shard save (reference :252-269),
  * per-example failure tolerance (bad URLs skipped, reference :47-49 —
    handled inside ``create_vl_dataset``).

Shards are .npz (image/input_ids/attention_mask arrays) — no Arrow
dependency on the load path; ``load_shards`` streams them back as batches.
"""

from __future__ import annotations

import os
import re
from typing import Iterator, Optional

import numpy as np

from forde_tpu.data.vl import create_vl_dataset

_SHARD_RE = re.compile(r"shard_(\d+)\.npz$")


def existing_shards(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    found = []
    for name in os.listdir(output_dir):
        m = _SHARD_RE.search(name)
        if m:
            found.append(int(m.group(1)))
    return sorted(found)


def _save_shard(output_dir: str, index: int, batches) -> str:
    path = os.path.join(output_dir, f"shard_{index:05d}.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        image=np.concatenate([b["image"] for b in batches]),
        input_ids=np.concatenate([b["input_ids"] for b in batches]),
        attention_mask=np.concatenate([b["attention_mask"] for b in batches]),
    )
    os.replace(tmp, path)  # atomic: a crash never leaves a torn shard
    return path


def download_shards(
    output_dir: str,
    num_shards: int = 10,
    examples_per_shard: int = 1024,
    batch_size: int = 64,
    image_size: int = 224,
    text_len: int = 64,
) -> int:
    """Download up to ``num_shards`` shards, resuming after any already on
    disk. Returns the number of complete shards present afterwards."""
    os.makedirs(output_dir, exist_ok=True)
    done = existing_shards(output_dir)
    start = (done[-1] + 1) if done else 0
    if start >= num_shards:
        print(f"[download] all {num_shards} shards already present")
        return len(done)
    print(f"[download] resuming at shard {start}/{num_shards}")

    batches_per_shard = max(1, examples_per_shard // batch_size)
    remaining = (num_shards - start) * batches_per_shard
    dataset = create_vl_dataset(
        batch_size, num_batches=remaining, image_size=image_size,
        text_len=text_len,
    )

    shard_idx = start
    buffer = []
    try:
        for batch in dataset:
            buffer.append(batch)
            if len(buffer) == batches_per_shard:
                path = _save_shard(output_dir, shard_idx, buffer)
                print(f"[download] wrote {path}")
                buffer = []
                shard_idx += 1
                if shard_idx >= num_shards:
                    break
    except KeyboardInterrupt:
        if buffer:
            path = _save_shard(output_dir, shard_idx, buffer)
            print(f"[download] interrupted — saved partial shard {path}")
            shard_idx += 1
        raise
    return len(existing_shards(output_dir))


def load_shards(
    output_dir: str, batch_size: int, num_epochs: Optional[int] = 1
) -> Iterator[dict]:
    """Stream saved shards back as training batches."""
    shards = existing_shards(output_dir)
    if not shards:
        raise FileNotFoundError(f"no shards in {output_dir}")
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        for idx in shards:
            with np.load(
                os.path.join(output_dir, f"shard_{idx:05d}.npz")
            ) as data:
                n = data["image"].shape[0]
                for lo in range(0, n - batch_size + 1, batch_size):
                    yield {
                        "image": data["image"][lo : lo + batch_size],
                        "input_ids": data["input_ids"][lo : lo + batch_size],
                        "attention_mask": data["attention_mask"][
                            lo : lo + batch_size
                        ],
                    }
        epoch += 1


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="vl_shards")
    p.add_argument("--num_shards", type=int, default=10)
    p.add_argument("--examples_per_shard", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()
    download_shards(
        args.output_dir, args.num_shards, args.examples_per_shard,
        args.batch_size,
    )
