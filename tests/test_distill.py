"""Distillation: KL toward the teacher decreases; CLI wiring."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.train.distill import make_distill_step
from forde_tpu.train.state import create_train_state
from tests.test_decoder_model import tiny_config


@pytest.mark.slow
def test_pure_kl_distillation_converges_toward_teacher():
    tcfg = tiny_config(use_moe=False, use_sparse_attention=False)
    teacher = FORDEDecoderLM(config=tcfg)
    tvars = teacher.init(jax.random.PRNGKey(7), jnp.ones((1, 8), jnp.int32))

    scfg = tiny_config(
        use_moe=False, use_sparse_attention=False, num_layers=1
    )
    state = create_train_state(
        scfg, jax.random.PRNGKey(0), 5e-3, 0.0, init_batch_shape=(1, 8)
    )
    step = make_distill_step(
        teacher, tvars, alpha=0.0, temperature=1.0
    )
    batch = {"input_ids": jnp.asarray(
        np.random.RandomState(0).randint(0, scfg.vocab_size, (4, 16)),
        jnp.int32)}
    kls = []
    for _ in range(40):
        state, metrics = step(state, batch)
        kls.append(float(metrics["loss/kl"]))
    assert np.isfinite(kls).all()
    assert kls[-1] < 0.5 * kls[0], (kls[0], kls[-1])


@pytest.mark.slow
def test_distill_cli_smoke(tmp_path):
    from forde_tpu.train import loop as train_loop

    base = [
        "--use_dummy_data", "--num_epochs", "1",
        "--batch_size", "2", "--seq_len", "32", "--no_nsa",
        "--d_model", "32", "--num_heads", "2",
        "--num_experts", "2", "--window_size", "8",
        "--slow_loop_interval", "0", "--log_interval", "1",
        "--plots_dir", "",
    ]
    teacher_dir = str(tmp_path / "teacher")
    train_loop.train(train_loop.build_parser().parse_args(
        base + ["--steps_per_epoch", "2", "--num_layers", "2",
                "--checkpoint_dir", teacher_dir]))
    out = train_loop.train(train_loop.build_parser().parse_args(
        base + ["--steps_per_epoch", "3", "--num_layers", "1",
                "--distill_from", teacher_dir]))
    assert out["step"] == 3
    assert "loss/kl" in out["final_metrics"]
    assert np.isfinite(out["final_metrics"]["loss/kl"])
