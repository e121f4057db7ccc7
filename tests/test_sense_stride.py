"""Sensing stride: the unsensed step must be the SAME optimization step.

The grad taps are identity on the forward and the stat reductions are
stop_gradient'd, so compiling sensing out cannot change params — only
skip the stats_buffer/grad_stats accumulation.
"""

import jax
import jax.numpy as jnp


def _copy(state):
    # both step variants donate their state arg; copy before each call
    return jax.tree.map(
        lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, state
    )
import numpy as np
import pytest

from forde_tpu.core.config import DTypePolicy, vit_tiny_config
from forde_tpu.train.clip_step import (
    clip_train_step,
    create_clip_train_state,
    make_nosense_step,
)


def _tiny_cfg():
    import dataclasses

    cfg = vit_tiny_config()
    return cfg.replace(
        image_size=32,
        vision=dataclasses.replace(cfg.vision, num_layers=2),
        text=dataclasses.replace(cfg.text, num_layers=1),
        dtypes=DTypePolicy(),  # fp32 for exact comparison
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    state = create_clip_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, batch_size=4, text_len=16
    )
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32),
        "input_ids": jnp.asarray(rng.randint(1, 100, (4, 16)), jnp.int32),
        "attention_mask": jnp.ones((4, 16), jnp.int32),
    }
    return cfg, state, batch


@pytest.mark.slow
def test_nosense_step_params_match_sensed(setup):
    cfg, state, batch = setup
    nosense = make_nosense_step(cfg)
    s_sense, m_sense = clip_train_step(_copy(state), batch)
    s_plain, m_plain = nosense(_copy(state), batch)
    np.testing.assert_allclose(
        float(m_sense["loss/contrastive"]),
        float(m_plain["loss/contrastive"]),
        rtol=1e-6,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        s_sense.params,
        s_plain.params,
    )


def test_nosense_step_leaves_stats_untouched(setup):
    cfg, state, batch = setup
    nosense = make_nosense_step(cfg)
    s_sense, _ = clip_train_step(_copy(state), batch)
    stats_before = jax.tree.map(np.asarray, s_sense.stats_buffer)
    count_before = int(s_sense.grad_step_count)
    s2, _ = nosense(s_sense, batch)
    # buffers pass through; a sensed step then sees one more accumulation
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        stats_before,
        s2.stats_buffer,
    )
    assert int(s2.grad_step_count) == count_before
    s3, _ = clip_train_step(s2, batch)
    assert int(s3.grad_step_count) == count_before + 1
