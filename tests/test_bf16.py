"""bfloat16 compute-path coverage on CPU: both model families train a step
with finite losses and fp32 stats."""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.core.config import DTypePolicy
from forde_tpu.train.state import create_train_state
from forde_tpu.train.step import train_step
from tests.test_decoder_model import tiny_config
from tests.test_dual_encoder import _batch, tiny_cfg
import pytest


@pytest.mark.slow
def test_decoder_bf16_step():
    cfg = tiny_config(dtypes=DTypePolicy.bf16())
    state = create_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0,
                               init_batch_shape=(1, 32))
    batch = {"input_ids": jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 32)))}
    state, m = train_step(state, batch, aux_loss_weight=1.0)
    assert np.isfinite(float(m["loss/total"]))
    # params remain fp32 (master weights)
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32
    # stats remain fp32
    usage = [v for p, v in
             jax.tree_util.tree_flatten_with_path(state.stats_buffer)[0]
             if "expert_usage" in str(p)]
    assert all(u.dtype == jnp.float32 for u in usage)


@pytest.mark.slow
def test_dual_encoder_bf16_step():
    from forde_tpu.train.clip_step import clip_train_step, create_clip_train_state

    cfg = tiny_cfg(dtypes=DTypePolicy.bf16())
    state = create_clip_train_state(cfg, jax.random.PRNGKey(0), 1e-3, 0.0,
                                    batch_size=2, text_len=cfg.max_text_len)
    batch = _batch(2, cfg)
    state, m = clip_train_step(state, batch)
    assert np.isfinite(float(m["loss/contrastive"]))
    for leaf in jax.tree.leaves(state.grad_stats):
        assert leaf.dtype == jnp.float32
