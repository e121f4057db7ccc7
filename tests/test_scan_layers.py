"""Scanned-layers decoder: shapes, stats layout, slow-loop compatibility,
loss decrease."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.brain.slow_loop import collect_moe_stats, moe_slow_loop_step
from forde_tpu.core.config import LLMConfig
from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.train.state import create_train_state
from forde_tpu.train.step import train_step
from tests.test_decoder_model import tiny_config


def scan_config(**kw):
    return tiny_config(scan_layers=True, **kw)


def test_scan_forward_and_collections():
    cfg = scan_config()
    model = FORDEDecoderLM(config=cfg)
    ids = jnp.ones((2, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    (logits, aux), updates = model.apply(variables, ids, mutable=["stats_buffer"])
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # stats stacked over layers
    buf = updates["stats_buffer"]["layers"]["block"]["moe"]
    assert buf["expert_usage"].shape == (cfg.num_layers, cfg.num_experts)
    assert buf["step_count"].shape == (cfg.num_layers,)
    assert all(int(c) == 1 for c in np.asarray(buf["step_count"]))


@pytest.mark.slow
def test_scan_stats_collection_and_slow_loop():
    cfg = scan_config()
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, init_batch_shape=(1, 16)
    )
    rng = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (2, 16)))}
    for _ in range(3):
        state, _ = train_step(state, batch, aux_loss_weight=1.0)

    usage, steps = collect_moe_stats(
        {"stats_buffer": state.stats_buffer}, cfg.num_layers, cfg.num_experts
    )
    assert int(steps) == 3
    assert usage.shape == (cfg.num_layers, cfg.num_experts)
    # each layer's usage sums to ~steps (mean router probs accumulate)
    np.testing.assert_allclose(np.asarray(usage.sum(-1)), 3.0, atol=1e-4)

    new_params, new_mv, diag = moe_slow_loop_step(
        state.params, {"stats_buffer": state.stats_buffer}, cfg,
        jax.random.PRNGKey(1),
    )
    assert not bool(diag["skipped"])
    # stacked (L, E) bias leaf counts as L updates
    assert int(diag["updates_count"]) == cfg.num_layers
    bias = new_params["layers"]["block"]["moe"]["moe_layer"]["router"][
        "router_linear"
    ]["bias"]
    assert bias.shape == (cfg.num_layers, cfg.num_experts)
    for leaf in jax.tree.leaves(new_mv["stats_buffer"]):
        assert float(jnp.abs(leaf).sum()) == 0.0


@pytest.mark.slow
def test_scan_train_decreases_loss():
    cfg = scan_config()
    state = create_train_state(
        cfg, jax.random.PRNGKey(0), 1e-3, 0.01, init_batch_shape=(1, 32)
    )
    rng = np.random.RandomState(42)
    batch = {"input_ids": jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 32)))}
    losses = []
    for _ in range(20):
        state, m = train_step(state, batch, aux_loss_weight=1.0)
        losses.append(float(m["loss/total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.3


@pytest.mark.slow
def test_scan_with_remat():
    cfg = scan_config(remat=True)
    model = FORDEDecoderLM(config=cfg)
    ids = jnp.ones((1, 16), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)

    def loss(params):
        (logits, aux), _ = model.apply(
            {"params": params, "stats_buffer": variables["stats_buffer"]},
            ids, mutable=["stats_buffer"],
        )
        return jnp.sum(logits**2) + aux

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))
