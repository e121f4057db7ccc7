"""Language-model data pipelines.

Parity target: reference src/data/dataset.py — a seeded dummy token stream
(dataset.py:20-76, np.random.RandomState(42)) and a streaming fineweb
pipeline tokenized with GPT-2 (dataset.py:96-222), falling back to dummy
data when the hub or deps are unavailable (dataset.py:116-118, 194-197).

TPU-first difference: batches are produced on a background prefetch thread
and transferred to device ahead of consumption (see ``prefetch.py``); the
reference blocks the step loop on host tokenization and a synchronous
host->device copy every step (train.py:330).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class DummyDataset:
    """Seeded random-token batches (reference dataset.py:20-76)."""

    def __init__(
        self,
        batch_size: int,
        seq_len: int,
        vocab_size: int,
        num_batches: int = 1000,
        seed: int = 42,
    ):
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.vocab_size = vocab_size
        self.num_batches = num_batches
        self.seed = seed

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        for _ in range(self.num_batches):
            yield {
                "input_ids": rng.randint(
                    0,
                    self.vocab_size,
                    size=(self.batch_size, self.seq_len),
                    dtype=np.int32,
                )
            }


class DummyBatchedDataset(DummyDataset):
    """Pre-materialized variant: generates all batches up front and
    replays them (reference DummyBatchedDataset, dataset.py:49-76). Useful
    for overfitting smoke tests where every epoch must see identical data.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._batches = list(DummyDataset.__iter__(self))

    def __iter__(self):
        return iter(self._batches)


def create_dummy_dataset(
    batch_size: int, seq_len: int, vocab_size: int, num_batches: int = 1000
) -> DummyDataset:
    """Reference create_dummy_dataset (dataset.py:79-93)."""
    return DummyDataset(batch_size, seq_len, vocab_size, num_batches)


class StreamingLMDataset:
    """Buffer a tokenized iterable into numpy-stacked batches
    (reference dataset.py:200-222)."""

    def __init__(self, dataset, batch_size: int, num_batches: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_batches = num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        buffer = []
        produced = 0
        for example in self.dataset:
            buffer.append(np.asarray(example["input_ids"], dtype=np.int32))
            if len(buffer) == self.batch_size:
                yield {"input_ids": np.stack(buffer)}
                buffer = []
                produced += 1
                if self.num_batches is not None and produced >= self.num_batches:
                    return


def create_lm_dataset(
    batch_size: int,
    seq_len: int,
    tokenizer_name: str = "gpt2",
    dataset_name: str = "HuggingFaceFW/fineweb",
    dataset_config: str = "sample-10BT",
    num_batches: Optional[int] = None,
    vocab_size_fallback: int = 50257,
):
    """Streaming fineweb LM dataset (reference dataset.py:96-197).

    Tokenizes with GPT-2 (pad = eos), truncating/padding to ``seq_len``.
    Falls back to the dummy dataset when datasets/transformers or the hub
    are unavailable, matching the reference's graceful degradation.
    """
    try:
        import datasets  # type: ignore
        from transformers import AutoTokenizer  # type: ignore

        tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token

        raw = datasets.load_dataset(
            dataset_name, name=dataset_config, streaming=True, split="train"
        )

        def tokenize(batch):
            out = tokenizer(
                batch["text"],
                truncation=True,
                max_length=seq_len,
                padding="max_length",
            )
            return {"input_ids": out["input_ids"]}

        tokenized = raw.map(
            tokenize,
            batched=True,
            remove_columns=[c for c in raw.column_names or [] if c != "input_ids"],
        )
        return StreamingLMDataset(tokenized, batch_size, num_batches)
    except Exception as exc:  # noqa: BLE001 — parity: any failure -> dummy
        print(f"[forde_tpu.data] falling back to dummy data: {exc}")
        return create_dummy_dataset(
            batch_size, seq_len, vocab_size_fallback, num_batches or 1000
        )
