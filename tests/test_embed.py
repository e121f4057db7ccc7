"""Embedding CLI: checkpoint -> image/text embeddings + similarity."""

import pytest
import numpy as np


@pytest.mark.slow
def test_embed_cli_roundtrip(tmp_path, capsys):
    from forde_tpu import embed
    from forde_tpu.train.clip_loop import build_parser, train

    ckpt = str(tmp_path / "ckpt")
    args = build_parser().parse_args([
        "--preset", "tiny", "--use_dummy_data", "--num_steps", "2",
        "--batch_size", "4", "--log_interval", "1",
        "--slow_loop_interval", "0", "--plots_dir", "",
        "--image_size", "32", "--patch_size", "16", "--text_len", "8",
        "--ema_decay", "0.9",
        "--checkpoint_dir", ckpt,
    ])
    train(args)

    img = (np.random.RandomState(0).rand(40, 40, 3) * 255).astype(np.uint8)
    img_path = str(tmp_path / "img.npy")
    np.save(img_path, img)  # wrong size on purpose: exercises the resize

    out_prefix = str(tmp_path / "emb")
    embed.main([
        "--checkpoint_dir", ckpt,
        "--image_npy", img_path,
        "--text_ids", "12,99,407;7,5",
        "--out", out_prefix,
        "--use_ema",
    ])
    text = capsys.readouterr().out
    assert "1 image embeddings" in text
    assert "2 text embeddings" in text
    assert "cosine similarity" in text and "EMA weights" in text
    ie = np.load(out_prefix + "_image.npy")
    te = np.load(out_prefix + "_text.npy")
    assert ie.shape[0] == 1 and te.shape[0] == 2
    assert ie.shape[1] == te.shape[1]
    assert np.isfinite(ie).all() and np.isfinite(te).all()
