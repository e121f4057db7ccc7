"""Cosine LR decay: schedule math + checkpoint tree round trip.

A non-constant schedule swaps optax's stateless LR scale for a
ScaleByScheduleState, so the train meta must carry the schedule flags
and every restore path must rebuild the identical optimizer tree.
"""

import numpy as np
import pytest

from forde_tpu.train.state import make_lr_schedule


def test_constant_stays_stateless():
    assert make_lr_schedule(3e-4) == 3e-4  # plain float, not a schedule


def test_warmup_then_cosine_values():
    lr = make_lr_schedule(
        1.0, warmup_steps=10, lr_schedule="cosine", decay_steps=100,
        min_lr_ratio=0.1,
    )
    assert float(lr(0)) == 0.0
    assert float(lr(5)) == pytest.approx(0.5)
    assert float(lr(10)) == pytest.approx(1.0)
    # halfway through the decay: midpoint of peak and floor
    assert float(lr(60)) == pytest.approx((1.0 + 0.1) / 2, rel=1e-5)
    # end of decay and beyond: hold the floor
    assert float(lr(110)) == pytest.approx(0.1, rel=1e-5)
    assert float(lr(500)) == pytest.approx(0.1, rel=1e-5)


def test_cosine_without_warmup():
    lr = make_lr_schedule(
        2.0, warmup_steps=0, lr_schedule="cosine", decay_steps=4,
    )
    assert float(lr(0)) == pytest.approx(2.0)
    assert float(lr(4)) == pytest.approx(0.0, abs=1e-7)


def test_cosine_requires_decay_steps():
    with pytest.raises(ValueError, match="decay_steps"):
        make_lr_schedule(1.0, lr_schedule="cosine")
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        make_lr_schedule(1.0, lr_schedule="linear")


@pytest.mark.slow
def test_cosine_checkpoint_roundtrip(tmp_path, capsys):
    """Train with cosine decay, checkpoint, then (a) resume and (b) serve
    from the checkpoint — both must rebuild the stateful-schedule
    optimizer tree from the train meta."""
    from forde_tpu import serve
    from forde_tpu.train import loop as train_loop

    ckpt = str(tmp_path / "ckpt")
    argv = [
        "--use_dummy_data", "--steps_per_epoch", "4", "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "32",
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--no_nsa",
        "--slow_loop_interval", "0", "--log_interval", "2",
        "--warmup_steps", "2", "--lr_schedule", "cosine",
        "--moment_dtype", "bfloat16",
        "--checkpoint_dir", ckpt,
    ]
    args = train_loop.build_parser().parse_args(argv)
    train_loop.train(args)
    out = capsys.readouterr().out
    assert "cosine decay over 2 steps" in out  # 4 total - 2 warmup

    # resume continues from the saved step with the same tree
    args2 = train_loop.build_parser().parse_args(
        argv + ["--resume", "--steps_per_epoch", "6"]
    )
    train_loop.train(args2)
    out = capsys.readouterr().out
    assert "resumed" in out.lower()

    serve.main([
        "--checkpoint_dir", ckpt, "--prompt_ids", "5,17,20",
        "--max_new_tokens", "2", "--temperature", "0",
    ])
    out = capsys.readouterr().out
    ids = eval(out.split("token ids:")[1].splitlines()[0])
    assert ids[:3] == [5, 17, 20] and len(ids) == 5


@pytest.mark.slow
def test_clip_cosine_smoke(capsys):
    from forde_tpu.train import clip_loop

    args = clip_loop.build_parser().parse_args([
        "--preset", "tiny", "--use_dummy_data", "--num_steps", "3",
        "--batch_size", "4", "--log_interval", "1",
        "--slow_loop_interval", "0", "--plots_dir", "",
        "--warmup_steps", "1", "--lr_schedule", "cosine",
        "--experiment_name", "pytest_smoke",
    ])
    clip_loop.train(args)
    out = capsys.readouterr().out
    assert "cosine decay over 2 steps" in out
