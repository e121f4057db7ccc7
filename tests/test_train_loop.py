"""Training driver integration: CLI loop, slow-loop wiring, checkpoint
save/restore roundtrip, prefetch."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.core.config import LLMConfig
from forde_tpu.data.prefetch import prefetch_to_device
from forde_tpu.train import checkpoint as ckpt_lib
from forde_tpu.train.loop import build_parser, train
from forde_tpu.train.state import create_train_state


def test_prefetch_preserves_order_and_content():
    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 2), i))


def test_checkpoint_roundtrip(tmp_path):
    cfg = LLMConfig(
        vocab_size=128, d_model=32, num_layers=1, num_heads=2, head_dim=16,
        max_seq_len=64, num_experts=2, top_k_experts=1, expert_hidden_dim=32,
        window_size=16, compression_ratio=4, top_k_global=8, num_streams=2,
        sinkhorn_iterations=2, dropout_rate=0.0, attention_impl="reference",
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0)
    # mutate something so restore is distinguishable from init
    state = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params), step=7
    )
    ckpt_lib.save_checkpoint(str(tmp_path / "ckpt"), state, step=7)

    fresh = create_train_state(cfg, jax.random.PRNGKey(1), 1e-3, 0.0)
    restored = ckpt_lib.restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == 7
    orig_leaves = jax.tree.leaves(state.params)
    rest_leaves = jax.tree.leaves(restored.params)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # stats_buffer restored too
    assert jax.tree.structure(restored.stats_buffer) == jax.tree.structure(
        state.stats_buffer
    )


def test_train_cli_smoke_with_slow_loop(tmp_path, capsys):
    """Full driver: tiny model, dummy data, slow loop firing, checkpoint."""
    args = build_parser().parse_args(
        [
            "--batch_size", "2",
            "--seq_len", "32",
            "--d_model", "32",
            "--num_layers", "2",
            "--num_heads", "2",
            "--num_experts", "4",
            "--window_size", "16",
            "--num_streams", "2",
            "--steps_per_epoch", "6",
            "--log_interval", "2",
            "--slow_loop_interval", "3",
            "--use_dummy_data",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--plots_dir", "",
            "--experiment_name", "pytest_smoke",
        ]
    )
    result = train(args)
    assert result["step"] == 6
    assert np.isfinite(result["final_metrics"]["loss/total"])
    out = capsys.readouterr().out
    assert "MoE Slow Loop" in out  # brain update fired
    # final checkpoint exists and is restorable
    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() == 6
    mgr.close()
