"""EMA of params: update math, loop integration, checkpoint + serve."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


def test_with_ema_one_step_math():
    """ema1 == decay * p0 + (1-decay) * p1 exactly (fused into the step)."""
    from tests.test_decoder_model import tiny_config
    from forde_tpu.train.ema import init_ema, with_ema
    from forde_tpu.train.state import create_train_state
    from forde_tpu.train.step import train_step

    cfg = tiny_config(use_moe=False, use_sparse_attention=False)
    state = init_ema(create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
    ))
    p0 = jax.tree.map(np.asarray, state.params)
    batch = {"input_ids": jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 16)),
        jnp.int32)}
    decay = 0.9
    step = with_ema(
        lambda s, b: train_step(s, b, aux_loss_weight=0.0), decay
    )
    new = step(state, batch)[0]
    for a, e, p in zip(
        jax.tree.leaves(p0),
        jax.tree.leaves(new.ema_params),
        jax.tree.leaves(new.params),
    ):
        np.testing.assert_allclose(
            np.asarray(e), decay * a + (1 - decay) * np.asarray(p),
            rtol=1e-6, atol=1e-7,
        )


@pytest.mark.slow
def test_ema_checkpoint_and_serve_roundtrip(tmp_path, capsys):
    """Train with --ema_decay + checkpoint; serve --use_ema restores and
    decodes from the EMA weights with no shape flags."""
    from forde_tpu import serve
    from forde_tpu.train import loop as train_loop

    ckpt = str(tmp_path / "ckpt")
    args = train_loop.build_parser().parse_args([
        "--use_dummy_data", "--steps_per_epoch", "2", "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "32",
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8",
        "--slow_loop_interval", "0", "--log_interval", "1",
        "--ema_decay", "0.99", "--plots_dir", "",
        "--checkpoint_dir", ckpt,
    ])
    out = train_loop.train(args)
    assert out["state"].ema_params is not None

    serve.main([
        "--checkpoint_dir", ckpt,
        "--use_ema",
        "--prompt_ids", "5,17,20",
        "--max_new_tokens", "3",
        "--temperature", "0",
    ])
    text = capsys.readouterr().out
    assert "serving EMA weights" in text
    ids = eval(text.split("token ids:")[1].splitlines()[0])
    assert ids[:3] == [5, 17, 20] and len(ids) == 6


@pytest.mark.slow
def test_clip_loop_ema_smoke():
    from forde_tpu.train.clip_loop import build_parser, train

    args = build_parser().parse_args([
        "--preset", "tiny", "--use_dummy_data", "--num_steps", "3",
        "--batch_size", "4", "--log_interval", "1",
        "--slow_loop_interval", "0", "--plots_dir", "",
        "--ema_decay", "0.9", "--sense_interval", "2",
        "--image_size", "32", "--patch_size", "16", "--text_len", "8",
    ])
    out = train(args)
    assert out["step"] == 3
    assert out["state"].ema_params is not None
    # EMA must differ from live params after 3 steps but stay close
    d = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(
            jax.tree.leaves(out["state"].ema_params),
            jax.tree.leaves(out["state"].params),
        )
    ]
    assert max(d) > 0
