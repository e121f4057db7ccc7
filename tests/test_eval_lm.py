"""Local-corpus dataset (data/lm.TextFileDataset) and the evaluation CLI
(forde_tpu.eval_lm) — the offline data + eval surfaces the reference
lacks (its only real data needs hub egress, src/data/dataset.py:128-133,
and it has no eval entry point at all)."""

import json

import numpy as np
import pytest

from forde_tpu.data.lm import create_text_file_dataset


class TestTextFileDataset:
    def test_byte_tokenization_windows(self, tmp_path):
        path = tmp_path / "corpus.txt"
        text = b"hello tpu world! " * 64  # 1088 bytes
        path.write_bytes(text)
        ds = create_text_file_dataset(
            str(path), batch_size=2, seq_len=16, num_batches=5
        )
        assert ds.vocab_hint == 256
        assert ds.windows.shape == (68, 16)
        batches = list(ds)
        assert len(batches) == 5
        for b in batches:
            assert b["input_ids"].shape == (2, 16)
            assert b["input_ids"].dtype == np.int32
            assert b["input_ids"].max() < 256
        # windows are contiguous slices of the byte stream
        stream = np.frombuffer(text, np.uint8).astype(np.int32)
        row = batches[0]["input_ids"][0]
        starts = [
            i for i in range(0, len(stream) - 15, 16)
            if np.array_equal(stream[i : i + 16], row)
        ]
        assert starts, "batch row is not a contiguous corpus window"

    def test_npy_token_ids(self, tmp_path):
        path = tmp_path / "ids.npy"
        np.save(path, np.arange(100, dtype=np.int64) + 877)
        ds = create_text_file_dataset(
            str(path), batch_size=1, seq_len=10, num_batches=3
        )
        assert ds.vocab_hint == 977
        assert ds.windows.shape == (10, 10)

    def test_epochs_reshuffle_and_loop(self, tmp_path):
        path = tmp_path / "c.txt"
        path.write_bytes(bytes(range(256)) * 4)  # 64 windows of 16
        ds = create_text_file_dataset(
            str(path), batch_size=32, seq_len=16, num_batches=4
        )
        batches = list(ds)  # 2 per epoch -> loops into a second epoch
        assert len(batches) == 4
        epoch1 = np.concatenate([batches[0]["input_ids"],
                                 batches[1]["input_ids"]])
        epoch2 = np.concatenate([batches[2]["input_ids"],
                                 batches[3]["input_ids"]])
        # same windows, different order
        assert not np.array_equal(epoch1, epoch2)
        assert np.array_equal(
            np.sort(epoch1, axis=0), np.sort(epoch2, axis=0)
        )

    def test_tiny_corpus_samples_with_replacement(self, tmp_path):
        path = tmp_path / "t.txt"
        path.write_bytes(b"0123456789abcdef")  # exactly 1 window
        ds = create_text_file_dataset(
            str(path), batch_size=4, seq_len=16, num_batches=2
        )
        batches = list(ds)
        assert len(batches) == 2
        assert batches[0]["input_ids"].shape == (4, 16)

    def test_too_small_raises(self, tmp_path):
        path = tmp_path / "t.txt"
        path.write_bytes(b"abc")
        with pytest.raises(ValueError, match="window"):
            create_text_file_dataset(str(path), 1, 16)


class TestEvalCLI:
    @pytest.mark.slow
    def test_eval_checkpoint_on_corpus(self, tmp_path, capsys):
        from forde_tpu.eval_lm import build_parser, evaluate
        from forde_tpu.train.loop import build_parser as train_parser
        from forde_tpu.train.loop import train

        corpus = tmp_path / "corpus.txt"
        corpus.write_bytes(b"the quick brown fox jumps over the lazy dog. "
                           * 50)
        ckpt = str(tmp_path / "ckpt")
        train(train_parser().parse_args([
            "--data_file", str(corpus), "--steps_per_epoch", "2",
            "--num_epochs", "1", "--batch_size", "2", "--seq_len", "16",
            "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
            "--num_experts", "2", "--window_size", "8",
            "--slow_loop_interval", "0", "--log_interval", "1",
            "--plots_dir", "", "--checkpoint_dir", ckpt,
        ]))
        out = evaluate(build_parser().parse_args([
            "--checkpoint_dir", ckpt, "--data_file", str(corpus),
            "--batch_size", "2", "--seq_len", "16", "--num_batches", "3",
        ]))
        assert out["batches"] == 3
        assert out["tokens"] == 3 * 2 * 15
        assert np.isfinite(out["lm_loss"])
        assert out["perplexity"] == pytest.approx(
            np.exp(out["lm_loss"]), rel=1e-3
        )
        # the JSON line is printed for scripting
        printed = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(printed)["batches"] == 3

    @pytest.mark.slow
    def test_eval_rejects_oversized_vocab(self, tmp_path):
        from forde_tpu.eval_lm import build_parser, evaluate
        from forde_tpu.train.loop import build_parser as train_parser
        from forde_tpu.train.loop import train

        ckpt = str(tmp_path / "ckpt")
        train(train_parser().parse_args([
            "--use_dummy_data", "--steps_per_epoch", "1", "--num_epochs",
            "1", "--batch_size", "2", "--seq_len", "16", "--d_model", "32",
            "--num_layers", "1", "--num_heads", "2", "--num_experts", "2",
            "--window_size", "8", "--slow_loop_interval", "0",
            "--log_interval", "1", "--plots_dir", "",
            "--checkpoint_dir", ckpt,
        ]))
        ids = tmp_path / "ids.npy"
        np.save(ids, np.array([99999, 3, 5] * 20))
        with pytest.raises(ValueError, match="model vocab"):
            evaluate(build_parser().parse_args([
                "--checkpoint_dir", ckpt, "--data_file", str(ids),
                "--batch_size", "1", "--seq_len", "8", "--num_batches", "1",
            ]))
