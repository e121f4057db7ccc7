"""Chunked prefill: one fixed-size prefill chunk per scheduler tick.

Splitting a prompt's prefill into decode-mode chunks is the same math
as one pass (each chunk's K/V land at the running offset and queries
attend back over everything written), so the pool must stay token-exact
— including with a shared prefix, slot reuse, and cancellation mid-fill.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate_cached
from tests.test_decoder_model import tiny_config


def _fixture(scan_layers=False):
    cfg = tiny_config(
        use_sparse_attention=False, max_seq_len=64, scan_layers=scan_layers
    )
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return cfg, model, variables


def _greedy(model, variables, prompt, new):
    return np.asarray(generate_cached(
        model, variables, jnp.asarray([prompt], jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
    ))[0].tolist()


def _drain(pool, limit=300):
    results, ticks = {}, 0
    while pool.pending():
        results.update(dict(pool.tick()))
        ticks += 1
        assert ticks < limit, "pool did not drain"
    return results, ticks


@pytest.mark.slow
def test_chunked_prefill_token_exact():
    """Chunk sizes that divide, straddle, and exceed the prompt length
    all produce the one-shot greedy outputs."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, cfg.vocab_size, (n,)).tolist()
               for n in (3, 8, 13, 5, 21)]
    for chunk in (4, 7, 64):
        pool = DecodePool(
            model, variables, rows=2, temperature=0.0, prefill_chunk=chunk
        )
        rids = [pool.submit(p, max_new_tokens=4) for p in prompts]
        results, _ = _drain(pool)
        for rid, p in zip(rids, prompts):
            assert results[rid] == _greedy(model, variables, p, 4), (
                chunk, rid
            )


@pytest.mark.slow
def test_chunked_prefill_with_prefix():
    """Chunked suffix prefill continues from the registered prefix cache
    — exact vs concatenated decoding."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture(scan_layers=True)
    rng = np.random.RandomState(1)
    prefix = rng.randint(1, cfg.vocab_size, (9,)).tolist()
    sufs = [rng.randint(1, cfg.vocab_size, (n,)).tolist() for n in (6, 11, 2)]

    pool = DecodePool(
        model, variables, rows=2, temperature=0.0, prefill_chunk=4
    )
    pid = pool.register_prefix(prefix)
    rids = [pool.submit(s, max_new_tokens=3, prefix_id=pid) for s in sufs]
    results, _ = _drain(pool)
    for rid, s in zip(rids, sufs):
        want = _greedy(model, variables, prefix + s, 3)[len(prefix):]
        assert results[rid] == want, rid


@pytest.mark.slow
def test_chunked_prefill_overlaps_decoding():
    """While one slot chunk-prefills a long prompt, the other slot keeps
    decoding — the long prompt must not stall the short one for its
    whole prefill (short request finishes strictly before the long
    one's first token at these sizes)."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(2)
    long_p = rng.randint(1, cfg.vocab_size, (32,)).tolist()  # 8 chunks of 4
    short_p = rng.randint(1, cfg.vocab_size, (3,)).tolist()

    pool = DecodePool(
        model, variables, rows=2, temperature=0.0, prefill_chunk=4
    )
    rid_long = pool.submit(long_p, max_new_tokens=2)
    rid_short = pool.submit(short_p, max_new_tokens=3)
    order = []
    while pool.pending():
        for rid, out in pool.tick():
            order.append(rid)
    assert order == [rid_short, rid_long]
    # fallback safety: chunk-aligned span that would spill the cache end
    # silently uses one-shot prefill (span 36 > 64 - 62... craft it)
    pool2 = DecodePool(
        model, variables, rows=1, temperature=0.0, prefill_chunk=60
    )
    p = rng.randint(1, cfg.vocab_size, (58,)).tolist()  # span 60 <= 64: ok
    r = pool2.submit(p, max_new_tokens=2)
    res, _ = _drain(pool2)
    assert res[r] == _greedy(model, variables, p, 2)


def test_cancel_mid_fill_frees_slot():
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(3)
    long_p = rng.randint(1, cfg.vocab_size, (32,)).tolist()
    pool = DecodePool(
        model, variables, rows=1, temperature=0.0, prefill_chunk=4
    )
    rid = pool.submit(long_p, max_new_tokens=4)
    pool.tick()  # admission + first chunk
    assert pool.cancel(rid) is True
    rid2 = pool.submit([5, 17, 20], max_new_tokens=2)
    results, _ = _drain(pool)
    assert set(results) == {rid2}
    assert results[rid2] == _greedy(model, variables, [5, 17, 20], 2)
