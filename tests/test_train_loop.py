"""Training driver integration: CLI loop, slow-loop wiring, checkpoint
save/restore roundtrip, prefetch."""

import os

import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _tiny_cfg():
    return LLMConfig(
        vocab_size=128, d_model=32, num_layers=1, num_heads=2, head_dim=16,
        max_seq_len=64, num_experts=2, top_k_experts=1, expert_hidden_dim=32,
        window_size=16, compression_ratio=4, top_k_global=8, num_streams=2,
        sinkhorn_iterations=2, dropout_rate=0.0, attention_impl="reference",
    )


@pytest.mark.slow
def test_checkpoint_force_save_replaces_existing_step(tmp_path):
    """force=True at an existing step replaces it with the NEW state
    (write-then-swap: the old step is never deleted before the new bytes
    are durable); force=False at an existing step is a no-op returning
    False."""
    cfg = _tiny_cfg()
    state_a = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0)
    state_b = state_a.replace(
        params=jax.tree.map(lambda x: x + 2.0, state_a.params)
    )
    mgr = ckpt_lib.CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    assert mgr.save(5, state_a, force=True)
    mgr.wait()
    assert not mgr.save(5, state_b, force=False)  # collision, no force
    assert mgr.save(5, state_b, force=True)  # replace
    mgr.wait()
    restored = mgr.restore(
        create_train_state(cfg, jax.random.PRNGKey(1), 1e-3, 0.0), step=5
    )
    mgr.close()
    for a, b in zip(
        jax.tree.leaves(state_b.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_restore_needs_matching_warmup_opt_state(tmp_path):
    """A warmup-trained opt_state has a schedule-count leaf that a
    warmup-0 optimizer lacks — serve.py must rebuild with the checkpoint
    meta's warmup_steps (and moment_dtype) or Orbax restore fails. This
    pins both directions: meta-matched restore works, mismatched raises."""
    import pytest

    cfg = _tiny_cfg()
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.0, warmup_steps=3
    )
    state = state.replace(step=1)
    d = str(tmp_path / "ckpt")
    ckpt_lib.save_checkpoint(d, state, step=1)
    ckpt_lib.save_model_config(d, cfg, train_meta={"warmup_steps": 3})

    meta = ckpt_lib.load_train_meta(d)
    good = create_train_state(
        cfg, jax.random.PRNGKey(1), 1e-3, 0.0,
        warmup_steps=int(meta.get("warmup_steps", 0) or 0),
    )
    restored = ckpt_lib.restore_checkpoint(d, good)
    assert int(restored.step) == 1

    bad = create_train_state(cfg, jax.random.PRNGKey(1), 1e-3, 0.0)
    with pytest.raises(Exception):
        ckpt_lib.restore_checkpoint(d, bad)


@pytest.mark.slow
def test_grad_accum_matches_full_batch_no_moe():
    """make_accum_train_step(A) == train_step on the full batch when the
    loss is linear in batch composition (no MoE aux): params match ~1e-5."""
    from tests.test_decoder_model import tiny_config
    from forde_tpu.train.step import make_accum_train_step, train_step

    cfg = tiny_config(use_moe=False, use_sparse_attention=False)
    batch = {
        "input_ids": jnp.asarray(
            np.random.RandomState(0).randint(0, cfg.vocab_size, (4, 16)),
            jnp.int32,
        )
    }
    import optax

    def mk():
        # SGD so the update is LINEAR in the gradient (Adam's g/(|g|+eps)
        # amplifies fp32 summation-order noise on near-zero elements)
        st = create_train_state(
            cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
        )
        tx = optax.sgd(1e-1)
        return st.replace(tx=tx, opt_state=tx.init(st.params))

    full, m_full = train_step(mk(), batch, aux_loss_weight=0.0)
    acc, m_acc = make_accum_train_step(2, aux_loss_weight=0.0)(mk(), batch)
    np.testing.assert_allclose(
        float(m_full["loss/lm"]), float(m_acc["loss/lm"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_full["training/grad_norm"]),
        float(m_acc["training/grad_norm"]), rtol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(full.params), jax.tree.leaves(acc.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_grad_accum_moe_stats_advance_per_microbatch():
    """MoE path: stats_buffer step_count advances accum_steps per
    optimizer step (usage/step_count normalization stays consistent)."""
    from tests.test_decoder_model import tiny_config
    from forde_tpu.train.step import make_accum_train_step

    cfg = tiny_config()
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-2, 0.0, init_batch_shape=(1, 16)
    )
    batch = {
        "input_ids": jnp.asarray(
            np.random.RandomState(1).randint(0, cfg.vocab_size, (4, 16)),
            jnp.int32,
        )
    }
    new, metrics = make_accum_train_step(4, aux_loss_weight=0.01)(state, batch)
    assert np.isfinite(float(metrics["loss/total"]))
    counts = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            new.stats_buffer
        )[0]
        if "step_count" in jax.tree_util.keystr(path)
    ]
    assert counts and all(int(c.max()) == 4 for c in counts)


@pytest.mark.slow
def test_grad_accum_cli_smoke():
    args = build_parser().parse_args(
        [
            "--batch_size", "4", "--grad_accum", "2", "--seq_len", "16",
            "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
            "--num_experts", "2", "--window_size", "8",
            "--steps_per_epoch", "2", "--num_epochs", "1",
            "--use_dummy_data", "--slow_loop_interval", "0",
            "--log_interval", "1", "--plots_dir", "",
        ]
    )
    out = train(args)
    assert out["step"] == 2
    assert np.isfinite(out["final_metrics"]["loss/total"])


@pytest.mark.slow
def test_sigterm_saves_resumable_checkpoint(tmp_path):
    """Graceful preemption: SIGTERM mid-run -> clean exit with a final
    checkpoint; --resume continues from it."""
    import signal
    import subprocess
    import sys
    import time

    ckpt = str(tmp_path / "ckpt")
    code = f"""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['FORDE_COMPILE_CACHE'] = '0'
import jax
jax.config.update('jax_platforms', 'cpu')
from forde_tpu.train.loop import build_parser, train
args = build_parser().parse_args([
    '--use_dummy_data', '--steps_per_epoch', '100000', '--num_epochs', '1',
    '--batch_size', '2', '--seq_len', '16', '--d_model', '32',
    '--num_layers', '1', '--num_heads', '2', '--num_experts', '2',
    '--window_size', '8', '--slow_loop_interval', '0', '--log_interval', '5',
    '--plots_dir', '', '--checkpoint_dir', {ckpt!r},
])
print('READY', flush=True)
train(args)
print('CLEAN-EXIT', flush=True)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd="/root/repo",
    )
    # give it time to compile and take a few steps, then preempt
    deadline = time.time() + 300
    saw_step = False
    for line in proc.stdout:
        if " step " in line and "loss" in line:
            saw_step = True
            break
        if time.time() > deadline:
            break
    assert saw_step, "training never reached a logged step"
    proc.send_signal(signal.SIGTERM)
    out = proc.stdout.read()
    assert proc.wait(timeout=300) == 0, out
    assert "CLEAN-EXIT" in out and "saving checkpoint" in out, out

    from forde_tpu.train import checkpoint as ckpt_lib

    mgr = ckpt_lib.CheckpointManager(ckpt)
    latest = mgr.latest_step()
    mgr.close()
    assert latest is not None and latest >= 1, latest
    # resumes cleanly
    from forde_tpu.train.loop import build_parser, train

    args = build_parser().parse_args([
        "--use_dummy_data", "--steps_per_epoch", str(latest + 2),
        "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "16", "--d_model", "32",
        "--num_layers", "1", "--num_heads", "2", "--num_experts", "2",
        "--window_size", "8", "--slow_loop_interval", "0",
        "--log_interval", "1", "--plots_dir", "",
        "--checkpoint_dir", ckpt, "--resume",
    ])
    out2 = train(args)
    assert out2["step"] == latest + 2
