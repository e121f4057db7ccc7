"""Vision-language (image, caption) data pipelines.

Parity target: the reference's Conceptual Captions downloader
(src/data/download_to_drive.py) which records the preprocessing contract:
224x224x3 float32 images (:173), bert-base-uncased tokenization (:122),
padded input_ids/attention_mask with max length 64 (:52-64), per-example
failure tolerance (:47-49).

TPU-first differences: the host workers only fetch/decode; resize +
normalize run vectorized in numpy per batch (and could be pushed on-device);
batches flow through the same device-prefetch path as the LM pipeline.
Synthetic data is the default stand-in (the reference's dummy-data
equivalent) so everything is testable and benchmarkable offline.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

MAX_TEXT_LENGTH = 64  # reference download_to_drive.py:52-64
IMAGE_SIZE = 224  # reference download_to_drive.py:173


class SyntheticVLDataset:
    """Seeded random (image, caption-token) pairs for tests/benchmarks."""

    def __init__(
        self,
        batch_size: int,
        num_batches: int = 100,
        image_size: int = IMAGE_SIZE,
        text_len: int = MAX_TEXT_LENGTH,
        vocab_size: int = 30522,
        seed: int = 42,
        pool: int = 0,
    ):
        """``pool`` > 0 pregenerates that many distinct batches and
        cycles them. Fresh per-batch generation costs ~80 ms of host
        numpy per 512-row batch — slower than a fused tiny train step,
        so throughput benchmarks with ``pool=0`` measure the host RNG,
        not the model (clip_loop ``--dummy_pool``)."""
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.image_size = image_size
        self.text_len = text_len
        self.vocab_size = vocab_size
        self.seed = seed
        self.pool = pool

    def __len__(self):
        return self.num_batches

    def _gen(self, rng) -> Dict[str, np.ndarray]:
        lengths = rng.randint(4, self.text_len + 1, size=self.batch_size)
        input_ids = np.zeros((self.batch_size, self.text_len), np.int32)
        mask = np.zeros((self.batch_size, self.text_len), np.int32)
        for i, ln in enumerate(lengths):
            input_ids[i, :ln] = rng.randint(1, self.vocab_size, size=ln)
            mask[i, :ln] = 1
        return {
            "image": rng.rand(
                self.batch_size, self.image_size, self.image_size, 3
            ).astype(np.float32),
            "input_ids": input_ids,
            "attention_mask": mask,
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.seed)
        if self.pool > 0:
            cache = [self._gen(rng) for _ in range(self.pool)]
            for i in range(self.num_batches):
                yield cache[i % self.pool]
            return
        for _ in range(self.num_batches):
            yield self._gen(rng)


class AlignedSyntheticVLDataset:
    """Procedurally ALIGNED (image, caption) pairs for offline learning runs.

    ``SyntheticVLDataset`` pairs random pixels with random tokens — nothing
    to learn. Here both modalities derive from a shared per-class latent:
    the image is a low-frequency render of the latent (noisy), the caption
    is a fixed token sequence for that class. A dual encoder must align the
    towers to beat chance, and evaluating on a disjoint ``class_range``
    measures generalization, not memorization. No reference counterpart
    (the reference has no evaluation path at all).
    """

    def __init__(
        self,
        batch_size: int,
        num_batches: int = 100,
        image_size: int = IMAGE_SIZE,
        text_len: int = MAX_TEXT_LENGTH,
        vocab_size: int = 30522,
        num_classes: int = 4096,
        latent_dim: int = 16,
        grid: int = 14,
        noise: float = 0.05,
        seed: int = 42,
        class_range: Optional[tuple] = None,
        compositional: bool = True,
        num_bins: int = 16,
        distinct: bool = False,
        sample_seed: Optional[int] = None,
    ):
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.image_size = image_size
        self.text_len = text_len
        self.vocab_size = vocab_size
        self.num_classes = num_classes
        self.noise = noise
        # ``seed`` fixes the WORLD (latents/basis/captions — the class
        # identity tables); ``sample_seed`` varies only which classes are
        # drawn and the image noise. An eval set must share the training
        # world (same seed) with a different sample_seed — changing seed
        # creates a different universe and makes every eval impossible.
        self.seed = seed
        self.sample_seed = seed if sample_seed is None else sample_seed
        self.distinct = distinct
        self.class_lo, self.class_hi = class_range or (0, num_classes)
        master = np.random.RandomState(seed)
        self.latents = master.randn(num_classes, latent_dim).astype(np.float32)
        self.grid = grid
        self.basis = (
            master.randn(latent_dim, grid * grid * 3).astype(np.float32)
            / np.sqrt(latent_dim)
        )
        if compositional:
            # COMPOSITIONAL captions: token i describes latent factor i,
            # quantized into num_bins quantile bins
            # (token = 1 + i*num_bins + bin). The caption is a discretized
            # description of the SAME latent that renders the image, so a
            # dual encoder that learns the token<->factor code generalizes
            # to held-out latent combinations — random per-class captions
            # (compositional=False) make cross-class generalization
            # information-theoretically impossible.
            assert vocab_size > 1 + latent_dim * num_bins
            edges = np.quantile(
                master.randn(100_000), np.linspace(0, 1, num_bins + 1)[1:-1]
            )
            bins = np.stack(
                [np.digitize(self.latents[:, i], edges)
                 for i in range(latent_dim)],
                axis=1,
            )  # (C, latent_dim) in [0, num_bins)
            offsets = 1 + np.arange(latent_dim) * num_bins
            caps = (offsets[None, :] + bins).astype(np.int32)
            self.captions = np.zeros((num_classes, text_len), np.int32)
            ln = min(latent_dim, text_len)
            self.captions[:, :ln] = caps[:, :ln]
            self.cap_lens = np.full(num_classes, ln, np.int32)
        else:
            # Fixed random caption per class (round-1 behavior): length in
            # [6, text_len], ids >= 1.
            self.captions = master.randint(
                1, vocab_size, size=(num_classes, text_len)
            ).astype(np.int32)
            self.cap_lens = master.randint(
                6, text_len + 1, size=num_classes
            ).astype(np.int32)

    def __len__(self):
        return self.num_batches

    def _render(self, classes: np.ndarray, rng) -> np.ndarray:
        coarse = np.tanh(self.latents[classes] @ self.basis)  # (B, g*g*3)
        g = self.grid
        coarse = coarse.reshape(-1, g, g, 3)
        rep = int(np.ceil(self.image_size / g))
        img = np.repeat(np.repeat(coarse, rep, axis=1), rep, axis=2)
        img = img[:, : self.image_size, : self.image_size, :]
        img = (img + 1.0) / 2.0
        if self.noise:
            img = img + rng.randn(*img.shape).astype(np.float32) * self.noise
        return np.clip(img, 0.0, 1.0).astype(np.float32)

    def class_schedule(self, rng) -> np.ndarray:
        """(num_batches, B) class ids. ``distinct=True`` samples without
        replacement across the WHOLE schedule (retrieval eval needs unique
        ground truths — duplicated classes make R@K ill-defined)."""
        pool = np.arange(self.class_lo, self.class_hi)
        total = self.batch_size * self.num_batches
        if self.distinct and pool.size >= total:
            return rng.choice(pool, size=total, replace=False).reshape(
                self.num_batches, self.batch_size
            )
        return np.stack([
            rng.choice(pool, size=self.batch_size,
                       replace=self.batch_size > pool.size)
            for _ in range(self.num_batches)
        ])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.RandomState(self.sample_seed + 7)
        for classes in self.class_schedule(rng):
            ids = self.captions[classes].copy()
            mask = (
                np.arange(self.text_len)[None, :]
                < self.cap_lens[classes][:, None]
            ).astype(np.int32)
            ids *= mask
            yield {
                "image": self._render(classes, rng),
                "input_ids": ids,
                "attention_mask": mask,
            }


class AlignedDeviceRenderer:
    """On-device batch synthesis for AlignedSyntheticVLDataset.

    The axon tunnel moves ~20 MB/s host->device; a (256, 224, 224, 3) fp32
    image batch is 154 MB — host-side rendering makes training transfer-
    bound at ~18 pairs/s. This renderer uploads the tiny class tables
    (latents/basis/captions) ONCE and synthesizes each batch on the TPU
    from a (B,) int32 class vector + PRNG key, i.e. the on-device
    preprocessing path the blueprint mandates (SURVEY.md §7.1 data/:
    "on-device resize/normalize, double-buffered to HBM").

    Produces batches numerically matching AlignedSyntheticVLDataset up to
    the noise stream (device PRNG instead of numpy).
    """

    def __init__(self, ds: AlignedSyntheticVLDataset):
        import jax
        import jax.numpy as jnp

        self._jnp = jnp
        self.ds = ds
        self.latents = jnp.asarray(ds.latents)
        self.basis = jnp.asarray(ds.basis)
        self.captions = jnp.asarray(ds.captions)
        self.cap_lens = jnp.asarray(ds.cap_lens)
        self._render = jax.jit(self._render_impl)

    def _render_impl(self, classes, key):
        jnp = self._jnp
        ds = self.ds
        g = ds.grid
        coarse = jnp.tanh(self.latents[classes] @ self.basis)
        coarse = coarse.reshape(-1, g, g, 3)
        rep = -(-ds.image_size // g)
        img = jnp.repeat(jnp.repeat(coarse, rep, axis=1), rep, axis=2)
        img = img[:, : ds.image_size, : ds.image_size, :]
        img = (img + 1.0) / 2.0
        if ds.noise:
            import jax

            img = img + jax.random.normal(key, img.shape) * ds.noise
        img = jnp.clip(img, 0.0, 1.0)
        ids = self.captions[classes]
        mask = (
            jnp.arange(ds.text_len)[None, :] < self.cap_lens[classes][:, None]
        ).astype(jnp.int32)
        return {
            "image": img,
            "input_ids": ids * mask,
            "attention_mask": mask,
        }

    def batches(self):
        """Device-resident batch iterator (classes sampled on host)."""
        import jax

        jnp = self._jnp
        ds = self.ds
        rng = np.random.RandomState(ds.sample_seed + 7)
        key = jax.random.PRNGKey(ds.sample_seed + 13)
        for classes in ds.class_schedule(rng):
            key, sub = jax.random.split(key)
            yield self._render(jnp.asarray(classes, jnp.int32), sub)


def hold_out_eval(batches, num_eval: int):
    """Split a batch iterator into (eval_batches, remaining_iterator).

    Materializes the FIRST ``num_eval`` batches as a held-out eval set —
    the training loop never sees them. This is how retrieval eval gets
    real held-out data when training on a live stream (VERDICT r1 item 7).
    """
    it = iter(batches)
    held = []
    for _ in range(num_eval):
        try:
            held.append(next(it))
        except StopIteration:
            break
    return held, it


def process_image(img, image_size: int = IMAGE_SIZE) -> np.ndarray:
    """Resize to (image_size, image_size, 3) float32 in [0, 1] — the deleted
    preprocessing contract (download_to_drive.py:12 imports this symbol)."""
    from PIL import Image  # lazy; only needed on the real ingest path

    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB").resize((image_size, image_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def create_vl_dataset(
    batch_size: int,
    num_batches: Optional[int] = None,
    image_size: int = IMAGE_SIZE,
    text_len: int = MAX_TEXT_LENGTH,
    tokenizer_name: str = "bert-base-uncased",
    dataset_name: str = "google-research-datasets/conceptual_captions",
    fetch_workers: int = 16,
):
    """Streaming Conceptual Captions pipeline.

    Image URLs are fetched by a thread pool (the reference's
    ThreadPoolExecutor pattern, download_to_drive.py:125-160), failures are
    skipped per-example (:47-49), captions are BERT-tokenized to padded
    (input_ids, attention_mask). Falls back to synthetic data when the hub
    or network is unavailable.
    """
    try:
        import io
        from concurrent.futures import ThreadPoolExecutor

        import datasets  # type: ignore
        import requests  # type: ignore
        from transformers import AutoTokenizer  # type: ignore

        tokenizer = AutoTokenizer.from_pretrained(tokenizer_name)
        raw = datasets.load_dataset(dataset_name, streaming=True, split="train")

        from forde_tpu.data import native

        def fetch_one(example):
            try:
                resp = requests.get(example["image_url"], timeout=5)
                resp.raise_for_status()
                from PIL import Image

                img = Image.open(io.BytesIO(resp.content)).convert("RGB")
                # decode only; resize+normalize runs batched in the native
                # C++ batcher (3x PIL throughput measured)
                return np.asarray(img, dtype=np.uint8), example["caption"]
            except Exception:
                return None

        def batches():
            produced = 0
            pool = ThreadPoolExecutor(max_workers=fetch_workers)
            images, captions = [], []
            it = iter(raw)
            while True:
                chunk = []
                try:
                    for _ in range(batch_size * 2):
                        chunk.append(next(it))
                except StopIteration:
                    if not chunk:
                        return
                for result in pool.map(fetch_one, chunk):
                    if result is None:
                        continue
                    images.append(result[0])
                    captions.append(result[1])
                    if len(images) == batch_size:
                        tok = tokenizer(
                            captions,
                            truncation=True,
                            max_length=text_len,
                            padding="max_length",
                            return_tensors="np",
                        )
                        yield {
                            # uint8 over the wire; prefetch_to_device
                            # normalizes to fp32 [0,1] on device (the
                            # host->device link is the bottleneck).
                            "image": native.batch_resize_u8(
                                images, image_size, image_size
                            ),
                            "input_ids": tok["input_ids"].astype(np.int32),
                            "attention_mask": tok["attention_mask"].astype(
                                np.int32
                            ),
                        }
                        images, captions = [], []
                        produced += 1
                        if num_batches is not None and produced >= num_batches:
                            return

        # Probe one example so failures fall back immediately.
        next(iter(raw))
        return batches()
    except Exception as exc:  # noqa: BLE001 — degrade like the reference
        print(f"[forde_tpu.data.vl] falling back to synthetic VL data: {exc}")
        return SyntheticVLDataset(
            batch_size, num_batches or 100, image_size, text_len
        )
