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


class MarkovDataset:
    """Structured synthetic token stream with a computable entropy floor.

    No counterpart in the reference (its only offline data is uniform
    random tokens, dataset.py:20-76, on which next-token loss cannot drop
    below ln(vocab)). This process is *learnable*: tokens live in an
    ``active_vocab``-sized subset of the full id range, and each next
    token follows a fixed random permutation of its predecessor with
    probability ``p`` (uniform over the active set otherwise).

    Achievable cross-entropy floors (nats):
      * unigram-only model:  ln(active_vocab)
      * perfect model:       -(p + q)·ln(p + q) - (A-1)·q·ln(q),
        with q = (1-p)/A, A = active_vocab.
    A fresh model starts at ln(vocab_size); learning shows up as loss
    crossing ln(active_vocab) and heading for the floor.
    """

    def __init__(
        self,
        batch_size: int,
        seq_len: int,
        vocab_size: int,
        active_vocab: int = 8192,
        p: float = 0.85,
        num_batches: int = 1000,
        seed: int = 42,
    ):
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.vocab_size = vocab_size
        self.active_vocab = min(active_vocab, vocab_size)
        self.p = p
        self.num_batches = num_batches
        self.seed = seed
        rng = np.random.RandomState(seed)
        # Active token ids spread over the full id range; a fixed random
        # successor permutation defines the deterministic branch.
        self.tokens = rng.choice(
            vocab_size, size=self.active_vocab, replace=False
        ).astype(np.int32)
        self.successor = rng.permutation(self.active_vocab).astype(np.int32)

    def entropy_floor(self) -> float:
        a = self.active_vocab
        q = (1.0 - self.p) / a
        main = self.p + q
        return float(-(main * np.log(main) + (a - 1) * q * np.log(q)))

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed + 1)
        for _ in range(self.num_batches):
            # Vectorized chain over active-set *indices*, then map to ids.
            idx = np.empty((self.batch_size, self.seq_len), np.int64)
            idx[:, 0] = rng.randint(0, self.active_vocab, self.batch_size)
            noise = rng.rand(self.batch_size, self.seq_len) >= self.p
            resample = rng.randint(
                0, self.active_vocab, (self.batch_size, self.seq_len)
            )
            for t in range(1, self.seq_len):
                step = self.successor[idx[:, t - 1]]
                idx[:, t] = np.where(noise[:, t], resample[:, t], step)
            yield {"input_ids": self.tokens[idx].astype(np.int32)}


def create_markov_dataset(
    batch_size: int,
    seq_len: int,
    vocab_size: int,
    num_batches: int = 1000,
    active_vocab: int = 8192,
    p: float = 0.85,
    seed: int = 42,
) -> MarkovDataset:
    return MarkovDataset(
        batch_size, seq_len, vocab_size,
        active_vocab=active_vocab, p=p, num_batches=num_batches, seed=seed,
    )


class TextFileDataset:
    """Train/eval on a LOCAL corpus — the offline data path the reference
    lacks (its only real data is hub-streamed fineweb, dataset.py:128-133,
    which needs egress). Accepts:

      * ``.npy`` — a 1-D array of token ids (any tokenizer, any vocab);
      * anything else — raw text read as bytes, byte-level ids 0..255
        (no tokenizer, no egress), unless ``tokenizer="gpt2"`` and the
        tokenizer cache is available.

    The token stream is packed into contiguous non-overlapping
    ``seq_len`` windows (remainder dropped), the window order is
    reshuffled each epoch (seeded), and epochs repeat until
    ``num_batches`` batches have been produced.
    """

    def __init__(
        self,
        path: str,
        batch_size: int,
        seq_len: int,
        num_batches: int = 1000,
        tokenizer: str = "byte",
        seed: int = 42,
    ):
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.num_batches = num_batches
        self.seed = seed
        if path.endswith(".npy"):
            ids = np.load(path).astype(np.int32).reshape(-1)
            self.vocab_hint = int(ids.max()) + 1
        elif tokenizer == "gpt2":
            from transformers import AutoTokenizer  # may raise: no cache

            tok = AutoTokenizer.from_pretrained("gpt2")
            with open(path, "r", errors="replace") as f:
                ids = np.asarray(tok.encode(f.read()), np.int32)
            self.vocab_hint = int(tok.vocab_size)
        else:
            with open(path, "rb") as f:
                ids = np.frombuffer(f.read(), np.uint8).astype(np.int32)
            self.vocab_hint = 256
        n_windows = len(ids) // seq_len
        if n_windows < 1:
            raise ValueError(
                f"{path}: {len(ids)} tokens < one seq_len={seq_len} window"
            )
        self.windows = ids[: n_windows * seq_len].reshape(n_windows, seq_len)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        produced = 0
        while produced < self.num_batches:
            order = rng.permutation(len(self.windows))
            for start in range(0, len(order) - self.batch_size + 1,
                               self.batch_size):
                if produced >= self.num_batches:
                    return
                rows = order[start : start + self.batch_size]
                yield {"input_ids": self.windows[rows]}
                produced += 1
            if len(self.windows) < self.batch_size:
                # tiny corpus: sample rows with replacement instead of
                # silently yielding nothing
                rows = rng.randint(0, len(self.windows), self.batch_size)
                yield {"input_ids": self.windows[rows]}
                produced += 1


def create_text_file_dataset(
    path: str,
    batch_size: int,
    seq_len: int,
    num_batches: int = 1000,
    tokenizer: str = "byte",
    seed: int = 42,
) -> TextFileDataset:
    return TextFileDataset(
        path, batch_size, seq_len,
        num_batches=num_batches, tokenizer=tokenizer, seed=seed,
    )


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
