"""Tests for the structured synthetic datasets (learnable offline data).

MarkovDataset / AlignedSyntheticVLDataset have no reference counterpart —
the reference's only offline data is uniform random tokens
(src/data/dataset.py:20-76), on which loss cannot drop below ln(vocab).
These datasets exist so learning runs are possible without network access.
"""

import numpy as np

from forde_tpu.data.lm import MarkovDataset, create_markov_dataset
from forde_tpu.data.vl import AlignedSyntheticVLDataset, hold_out_eval


class TestMarkovDataset:
    def test_shapes_and_range(self):
        ds = MarkovDataset(4, 32, vocab_size=1000, active_vocab=100,
                           num_batches=3)
        batches = list(ds)
        assert len(batches) == 3
        for b in batches:
            ids = b["input_ids"]
            assert ids.shape == (4, 32) and ids.dtype == np.int32
            assert set(np.unique(ids)).issubset(set(ds.tokens.tolist()))

    def test_deterministic(self):
        a = list(MarkovDataset(2, 16, 500, active_vocab=50, num_batches=2))
        b = list(MarkovDataset(2, 16, 500, active_vocab=50, num_batches=2))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["input_ids"], y["input_ids"])

    def test_transition_statistics(self):
        """Empirical successor-follow rate matches p (within noise)."""
        p = 0.8
        ds = MarkovDataset(16, 256, 2000, active_vocab=200, p=p,
                           num_batches=4)
        inv = {int(t): i for i, t in enumerate(ds.tokens)}
        follows, total = 0, 0
        for b in ds:
            idx = np.vectorize(inv.get)(b["input_ids"])
            expect = ds.successor[idx[:, :-1]]
            # noise branch can also land on the successor (prob 1/A)
            follows += int((idx[:, 1:] == expect).sum())
            total += expect.size
        rate = follows / total
        expected = p + (1 - p) / ds.active_vocab
        assert abs(rate - expected) < 0.02, (rate, expected)

    def test_entropy_floor(self):
        ds = create_markov_dataset(1, 8, 1000, active_vocab=100, p=0.9)
        floor = ds.entropy_floor()
        # floor must sit between 0 and unigram entropy ln(A)
        assert 0.0 < floor < np.log(100)
        # p -> 1 drives the floor toward 0
        tight = MarkovDataset(1, 8, 1000, active_vocab=100, p=0.999)
        assert tight.entropy_floor() < floor


class TestAlignedVL:
    def _ds(self, **kw):
        base = dict(batch_size=8, num_batches=2, image_size=32, text_len=16,
                    vocab_size=512, num_classes=64, seed=3)
        base.update(kw)
        return AlignedSyntheticVLDataset(**base)

    def test_shapes(self):
        for b in self._ds():
            assert b["image"].shape == (8, 32, 32, 3)
            assert b["image"].dtype == np.float32
            assert 0.0 <= b["image"].min() and b["image"].max() <= 1.0
            assert b["input_ids"].shape == (8, 16)
            assert b["attention_mask"].shape == (8, 16)
            # masked positions are zeroed
            assert (b["input_ids"] * (1 - b["attention_mask"]) == 0).all()

    def test_alignment_caption_fixed_per_class(self):
        ds = self._ds()
        # same class always renders the same caption
        c = ds.captions[5] * (np.arange(16) < ds.cap_lens[5])
        batch = next(iter(ds))
        # find any example and check its caption matches its class's table
        row = batch["input_ids"][0]
        matches = [
            k for k in range(64)
            if np.array_equal(
                row, ds.captions[k] * (np.arange(16) < ds.cap_lens[k])
            )
        ]
        assert matches, "caption must come from the class table"
        assert c.shape == row.shape

    def test_class_range_disjoint(self):
        train = self._ds(class_range=(0, 48))
        evald = self._ds(class_range=(48, 64), seed=4)
        train_caps = {tuple(r) for b in train for r in b["input_ids"]}
        eval_caps = {tuple(r) for b in evald for r in b["input_ids"]}
        assert not (train_caps & eval_caps)

    def test_images_consistent_per_class(self):
        ds = self._ds(noise=0.0)
        imgs = {}
        for b in ds:
            for img, ids in zip(b["image"], b["input_ids"]):
                key = tuple(ids)
                if key in imgs:
                    np.testing.assert_allclose(imgs[key], img, atol=1e-6)
                imgs[key] = img


def test_world_seed_vs_sample_seed():
    """Same ``seed`` => same class tables (one world); ``sample_seed``
    changes only sampling/noise. Regression: an eval set built with a
    different world seed scores against different classes entirely."""
    a = AlignedSyntheticVLDataset(4, 1, image_size=32, text_len=16,
                                  vocab_size=512, num_classes=32, seed=5)
    b = AlignedSyntheticVLDataset(4, 1, image_size=32, text_len=16,
                                  vocab_size=512, num_classes=32, seed=5,
                                  sample_seed=99)
    c = AlignedSyntheticVLDataset(4, 1, image_size=32, text_len=16,
                                  vocab_size=512, num_classes=32, seed=6)
    np.testing.assert_array_equal(a.captions, b.captions)
    np.testing.assert_array_equal(a.latents, b.latents)
    assert not np.array_equal(a.captions, c.captions)
    # different sample_seed -> (almost surely) different class draw
    rng_a, rng_b = (np.random.RandomState(d.sample_seed + 7) for d in (a, b))
    assert not np.array_equal(a.class_schedule(rng_a), b.class_schedule(rng_b))


def test_hold_out_eval_split():
    items = [{"i": i} for i in range(10)]
    held, rest = hold_out_eval(iter(items), 3)
    assert [h["i"] for h in held] == [0, 1, 2]
    assert [r["i"] for r in rest] == list(range(3, 10))
    # fewer items than requested: take what exists
    held2, rest2 = hold_out_eval(iter(items[:2]), 5)
    assert len(held2) == 2 and list(rest2) == []
