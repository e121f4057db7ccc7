"""Resumable shard download/load (reference download_to_drive.py parity:
shard scan resume, atomic writes, replay)."""

import numpy as np

from forde_tpu.data import download


def test_shard_roundtrip_and_resume(tmp_path, monkeypatch):
    calls = {"n": 0}

    def fake_dataset(batch_size, num_batches=None, image_size=224, text_len=64):
        from forde_tpu.data.vl import SyntheticVLDataset
        calls["n"] += 1
        return SyntheticVLDataset(
            batch_size, num_batches, image_size=8, text_len=4, seed=calls["n"]
        )

    monkeypatch.setattr(download, "create_vl_dataset", fake_dataset)

    out = str(tmp_path / "shards")
    n = download.download_shards(
        out, num_shards=3, examples_per_shard=8, batch_size=4
    )
    assert n == 3
    assert download.existing_shards(out) == [0, 1, 2]

    # resume: nothing new downloaded
    n2 = download.download_shards(
        out, num_shards=3, examples_per_shard=8, batch_size=4
    )
    assert n2 == 3

    # partial resume: ask for more shards, only the delta is fetched
    n3 = download.download_shards(
        out, num_shards=5, examples_per_shard=8, batch_size=4
    )
    assert n3 == 5

    batches = list(download.load_shards(out, batch_size=4, num_epochs=1))
    assert len(batches) == 5 * 2  # 8 examples/shard / 4 per batch
    for b in batches:
        assert b["image"].shape == (4, 8, 8, 3)
        assert b["input_ids"].shape == (4, 4)
        assert np.isfinite(b["image"]).all()
