"""Sampling tests: shapes, prompt preservation, greedy determinism,
causal consistency (generated prefix unaffected by later steps)."""

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate
from tests.test_decoder_model import tiny_config


def _model_and_vars():
    cfg = tiny_config()
    model = FORDEDecoderLM(config=cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    return cfg, model, variables


def test_generate_shapes_and_prompt_preserved():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 5)), jnp.int32
    )
    out = generate(
        model, variables, prompt, jax.random.PRNGKey(1), max_new_tokens=6
    )
    assert out.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out[:, :5]), np.asarray(prompt))
    assert int(out.max()) < cfg.vocab_size and int(out.min()) >= 0


def test_greedy_is_deterministic():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    a = generate(
        model, variables, prompt, jax.random.PRNGKey(1), max_new_tokens=5,
        temperature=0,
    )
    b = generate(
        model, variables, prompt, jax.random.PRNGKey(2), max_new_tokens=5,
        temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_prefix_consistency():
    """Greedy decoding N then N+3 tokens agrees on the first N — i.e. the
    padded buffer's future garbage never leaks into earlier steps."""
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    short = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=4,
        temperature=0,
    )
    long = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=7,
        temperature=0,
    )
    np.testing.assert_array_equal(
        np.asarray(short[:, :8]), np.asarray(long[:, :8])
    )


def test_top_k_restricts_support():
    cfg, model, variables = _model_and_vars()
    prompt = jnp.ones((1, 4), jnp.int32)
    # top_k=1 == greedy regardless of temperature
    g = generate(
        model, variables, prompt, jax.random.PRNGKey(3), max_new_tokens=5,
        temperature=0,
    )
    k1 = generate(
        model, variables, prompt, jax.random.PRNGKey(7), max_new_tokens=5,
        temperature=2.0, top_k=1,
    )
    np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))


def test_cached_generation_matches_full_recompute():
    """KV-cache greedy decode == full-recompute greedy decode (no-NSA cfg)."""
    from forde_tpu.models.generate import generate_cached

    cfg = tiny_config(use_sparse_attention=False)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.asarray(
        np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 6)), jnp.int32
    )
    full = generate(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=8,
        temperature=0,
    )
    cached = generate_cached(
        model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=8,
        temperature=0,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cached))


def test_cached_generation_rejects_nsa_config():
    from forde_tpu.models.generate import generate_cached

    cfg = tiny_config()  # NSA on
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    prompt = jnp.ones((1, 4), jnp.int32)
    try:
        generate_cached(
            model, variables, prompt, jax.random.PRNGKey(0), max_new_tokens=2
        )
        raise AssertionError("expected ValueError for NSA decode")
    except ValueError:
        pass
