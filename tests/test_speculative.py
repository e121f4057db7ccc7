"""Speculative decoding: greedy exactness vs the target's own cached
decode, all-accept fast path when draft == target, EOS semantics."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate_cached
from forde_tpu.models.speculative import generate_speculative
from tests.test_decoder_model import tiny_config


def _mk(seed, **kw):
    cfg = tiny_config(use_sparse_attention=False, **kw)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.ones((1, 8), jnp.int32)
    )
    return cfg, model, variables


@pytest.mark.slow
def test_speculative_greedy_matches_target_cached():
    """T=0: speculative output must be TOKEN-EXACT the target's greedy
    chain, independent of the (different-seed) draft model."""
    cfg, model, variables = _mk(0)
    _, draft, dvars = _mk(12345, num_layers=1)
    prompt = jnp.asarray([[5, 17, 200, 9]], jnp.int32)
    want = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(1),
        max_new_tokens=10, temperature=0,
    )
    got, stats = generate_speculative(
        model, variables, draft, dvars, prompt, jax.random.PRNGKey(2),
        max_new_tokens=10, gamma=3, temperature=0, with_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert int(stats["generated"]) >= 10
    assert int(stats["rounds"]) >= 1


@pytest.mark.slow
def test_speculative_draft_is_target_accepts_everything():
    """draft == target and T=0: every proposal accepted -> gamma+1 tokens
    per round, rounds == ceil(max_new / (gamma+1))."""
    cfg, model, variables = _mk(0)
    prompt = jnp.asarray([[3, 7]], jnp.int32)
    gamma, max_new = 4, 12
    got, stats = generate_speculative(
        model, variables, model, variables, prompt, jax.random.PRNGKey(2),
        max_new_tokens=max_new, gamma=gamma, temperature=0, with_stats=True,
    )
    want = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(1),
        max_new_tokens=max_new, temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert int(stats["rounds"]) == -(-max_new // (gamma + 1))


def test_speculative_eos_pads_tail():
    cfg, model, variables = _mk(0)
    _, draft, dvars = _mk(99, num_layers=1)
    prompt = jnp.asarray([[5, 17, 200, 9]], jnp.int32)
    # pick the first greedily generated token as the "EOS" so it fires
    ref = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(1),
        max_new_tokens=10, temperature=0,
    )
    eos = int(ref[0, 4])
    got = generate_speculative(
        model, variables, draft, dvars, prompt, jax.random.PRNGKey(2),
        max_new_tokens=10, gamma=3, temperature=0, eos_id=eos, pad_id=0,
    )
    out = np.asarray(got)[0]
    assert out[4] == eos
    np.testing.assert_array_equal(out[5:], np.zeros(9, np.int32))


@pytest.mark.slow
def test_speculative_scan_layers_target():
    cfg, model, variables = _mk(0, scan_layers=True)
    _, draft, dvars = _mk(7, num_layers=1)
    prompt = jnp.asarray([[2, 4, 6]], jnp.int32)
    want = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(1),
        max_new_tokens=6, temperature=0,
    )
    got = generate_speculative(
        model, variables, draft, dvars, prompt, jax.random.PRNGKey(2),
        max_new_tokens=6, gamma=2, temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
