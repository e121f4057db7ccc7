"""Ragged NSA: the length-aware forward, padded one-compile prefill, and
ragged generation for the reference's DEFAULT architecture
(/root/reference/src/forde/model.py:55 use_sparse_attention=True).

Three layers of exactness, each against the per-row exact-length path:

* the ragged training forward (``lengths``) must reproduce every row's
  exact-length logits at positions < len — including the traced branch
  gates, the -inf pad importance masking, and the per-row pool-count
  masking (INVALID_KEY_POS) that keeps even the reference's
  all-masked-uniform quirk normalizing over the right pool set;
* ``nsa_prefill`` with ``lengths`` must be LEAF-EXACT (ring slots, chunk
  sums/pools, running top-k set AND slot order) against each row's
  exact-length prefill;
* ``generate_ragged`` must be TOKEN-exact against single-sequence
  ``generate_cached`` greedy decoding per row.

Fixture lengths deliberately straddle the gates (window=16, ratio=4):
5 (< window: local only), 18 (> window: top-k on), 26 and 32
(> window + ratio: all three branches).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate_cached, generate_ragged, nsa_prefill
from tests.test_decoder_model import tiny_config

LENS = [5, 18, 26, 32]
PMAX = 32


def _fixture(scan_layers=False):
    cfg = tiny_config(max_seq_len=64, scan_layers=scan_layers)  # NSA on
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, cfg.vocab_size, (n,)).tolist() for n in LENS]
    padded = np.zeros((len(LENS), PMAX), np.int32)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p
    return cfg, model, variables, prompts, padded


@pytest.mark.slow
def test_ragged_forward_matches_exact_length_rows():
    """model.apply(padded, lengths=...) == per-row exact-length forward
    at every real position."""
    cfg, model, variables, prompts, padded = _fixture()
    (lr, _), _ = model.apply(
        variables, jnp.asarray(padded),
        lengths=jnp.asarray(LENS, jnp.int32), mutable=["stats_buffer"],
    )
    for i, p in enumerate(prompts):
        (le, _), _ = model.apply(
            variables, jnp.asarray([p], jnp.int32), mutable=["stats_buffer"]
        )
        np.testing.assert_allclose(
            np.asarray(lr[i, : len(p)]), np.asarray(le[0]), atol=2e-5,
            err_msg=f"row {i} (len {len(p)})",
        )


@pytest.mark.parametrize(
    "scan_layers", [False, pytest.param(True, marks=pytest.mark.slow)]
)
@pytest.mark.slow
def test_ragged_prefill_leaf_exact(scan_layers):
    """nsa_prefill(padded, lengths) row i == nsa_prefill(exact row i):
    every batched cache leaf (ring K/V, chunk sums, comp pools, top-k
    scores/idxs/K/V) and the last-real-token logits."""
    cfg, model, variables, prompts, padded = _fixture(scan_layers)
    mv = {"params": variables["params"], "stats_buffer": {}}
    cache_r, last_r = nsa_prefill(
        model, mv, jnp.asarray(padded), jnp.asarray(LENS, jnp.int32)
    )
    flat_r = jax.tree_util.tree_leaves_with_path(cache_r)
    for i, p in enumerate(prompts):
        cache_e, last_e = nsa_prefill(model, mv, jnp.asarray([p], jnp.int32))
        flat_e = dict(jax.tree_util.tree_leaves_with_path(cache_e))
        np.testing.assert_allclose(
            np.asarray(last_r[i]), np.asarray(last_e[0]), atol=2e-5,
            err_msg=f"row {i} last logits",
        )
        for path, leaf_r in flat_r:
            keys = [getattr(k, "key", None) for k in path]
            ax = 1 if keys and keys[0] == "layers" else 0  # scan stacking
            if leaf_r.ndim < ax + 2:
                continue  # position counters: not per-row (see nsa_prefill)
            # empty top-k slots are -inf on BOTH sides; nan_to_num maps
            # them to equal finite sentinels for the comparison
            a = np.nan_to_num(
                np.asarray(jnp.take(leaf_r, i, axis=ax), np.float32)
            )
            b = np.nan_to_num(
                np.asarray(jnp.take(flat_e[path], 0, axis=ax), np.float32)
            )
            np.testing.assert_allclose(
                a, b, atol=2e-5, err_msg=f"row {i} leaf {keys}"
            )


@pytest.mark.parametrize(
    "scan_layers", [False, pytest.param(True, marks=pytest.mark.slow)]
)
@pytest.mark.slow
def test_generate_ragged_nsa_token_exact(scan_layers):
    """Mixed-length NSA prompts, ONE padded program: every row equals the
    single-sequence generate_cached greedy continuation."""
    cfg, model, variables, prompts, padded = _fixture(scan_layers)
    out = np.asarray(generate_ragged(
        model, variables, jnp.asarray(padded),
        jnp.asarray(LENS, jnp.int32), jax.random.PRNGKey(0),
        max_new_tokens=8, temperature=0,
    ))
    for i, p in enumerate(prompts):
        ref = np.asarray(generate_cached(
            model, variables, jnp.asarray([p], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=8, temperature=0,
        ))[0]
        assert out[i, : len(p) + 8].tolist() == ref.tolist(), f"row {i}"


def test_generate_ragged_nsa_rejects_prefix():
    """Prefix caching stays dense-only: NSA streaming caches depend on
    what follows the prefix (prefill_prefix contract)."""
    from forde_tpu.models.generate import prefill_prefix

    cfg, model, variables, _, _ = _fixture()
    dense_cfg = tiny_config(use_sparse_attention=False, max_seq_len=64)
    dense_model = FORDEDecoderLM(config=dense_cfg)
    dense_vars = dense_model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )
    pc = prefill_prefix(
        dense_model, dense_vars, jnp.asarray([[1, 2, 3]], jnp.int32)
    )
    with pytest.raises(ValueError, match="dense-causal"):
        generate_ragged(
            model, variables, jnp.ones((2, 4), jnp.int32),
            jnp.array([4, 2], jnp.int32), jax.random.PRNGKey(0),
            prefix_cache=pc,
        )
