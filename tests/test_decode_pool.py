"""Continuous batching engine: slot reuse, mid-flight joins, exactness.

Every request that flows through the pool must produce exactly the
single-prompt greedy continuation of generate_cached — the pool only
changes WHEN work happens, never the results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _single(model, variables, prompt, new):
    return np.asarray(generate_cached(
        model, variables, jnp.asarray([prompt], jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
    ))[0].tolist()


def test_pool_more_requests_than_rows_all_exact():
    """5 mixed-length requests through a 2-slot pool: slots must be
    reused and every output equals single-prompt greedy decoding."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(0)
    prompts = [
        rng.randint(1, cfg.vocab_size, (n,)).tolist()
        for n in (3, 5, 2, 7, 4)
    ]
    budgets = [4, 2, 5, 3, 4]

    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    rids = [
        pool.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)
    ]
    results = {}
    ticks = 0
    while pool.pending():
        for rid, out in pool.tick():
            results[rid] = out
        ticks += 1
        assert ticks < 200, "pool did not drain"
    assert set(results) == set(rids)
    for rid, p, b in zip(rids, prompts, budgets):
        assert results[rid] == _single(model, variables, p, b), (
            f"request {rid} diverged"
        )


@pytest.mark.slow
def test_pool_mid_flight_join_and_eos():
    """A request submitted while others are mid-decode joins a free slot
    without disturbing them; EOS frees a slot early."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture(scan_layers=True)
    p0, p1, p2 = [5, 17, 20], [9, 9], [7, 3, 11, 8]
    ref0 = _single(model, variables, p0, 6)
    eos0 = ref0[len(p0) + 1]  # second generated token ends request 0

    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    r0 = pool.submit(p0, max_new_tokens=6, eos_id=eos0)
    r1 = pool.submit(p1, max_new_tokens=5)
    results = {}
    ticks = 0
    joined = False
    while pool.pending() or not joined:
        if ticks == 2 and not joined:
            r2 = pool.submit(p2, max_new_tokens=3)
            joined = True
        for rid, out in pool.tick():
            results[rid] = out
        ticks += 1
        assert ticks < 100
    # eos truncation: request 0 stops at its eos token
    assert results[r0] == ref0[: len(p0) + 2]
    assert results[r1] == _single(model, variables, p1, 5)
    assert results[r2] == _single(model, variables, p2, 3)


@pytest.mark.slow
def test_pool_decode_fuse_token_exact():
    """decode_fuse=4 (k-token fused scan steps) must produce exactly the
    unfused greedy outputs — including rows that hit EOS or exhaust
    their budget MID-scan (their surplus scan tokens are discarded) and
    a request that joins after the pool went fused (admission happens at
    the next tick boundary; decode rows are independent, so the later
    join never perturbs other rows' tokens)."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    p0, p1 = [5, 17, 20], [9, 9]
    ref0 = _single(model, variables, p0, 10)
    eos0 = ref0[len(p0) + 2]  # third generated token ends request 0

    pool = DecodePool(model, variables, rows=2, temperature=0.0,
                      decode_fuse=4)
    r0 = pool.submit(p0, max_new_tokens=10, eos_id=eos0)
    r1 = pool.submit(p1, max_new_tokens=9)  # budget not divisible by 4
    results = {}
    ticks = 0
    joined = False
    while pool.pending() or not joined:
        if ticks == 1 and not joined:
            r2 = pool.submit([7, 3, 11], max_new_tokens=5)
            joined = True
        for rid, out in pool.tick():
            results[rid] = out
        ticks += 1
        assert ticks < 100
    assert results[r0] == ref0[: len(p0) + 3]  # stopped at eos mid-scan
    assert results[r1] == _single(model, variables, p1, 9)
    assert results[r2] == _single(model, variables, [7, 3, 11], 5)


@pytest.mark.slow
def test_pool_decode_fuse_streams_in_order():
    """Fused ticks still fire the on_token callback once per accepted
    token, in generation order."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    p = [5, 17, 20]
    ref = _single(model, variables, p, 6)

    pool = DecodePool(model, variables, rows=2, temperature=0.0,
                      decode_fuse=4)
    seen = []
    pool.submit(p, max_new_tokens=6,
                on_token=lambda rid, tok: seen.append(tok))
    while pool.pending():
        pool.tick()
    assert seen == ref[len(p):]


def _nsa_fixture():
    cfg = tiny_config(max_seq_len=64)  # NSA on (window 16, ratio 4)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return cfg, model, variables


@pytest.mark.slow
def test_pool_nsa_all_exact():
    """The reference's DEFAULT architecture (NSA) through the continuous
    pool: slot reuse across 5 mixed-length requests (lengths straddling
    the window/ratio gates), every output token-exact vs single-sequence
    generate_cached greedy decoding."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _nsa_fixture()
    rng = np.random.RandomState(1)
    prompts = [
        rng.randint(1, cfg.vocab_size, (n,)).tolist()
        for n in (3, 18, 22, 7, 26)
    ]
    budgets = [4, 6, 5, 3, 6]
    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    rids = [
        pool.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)
    ]
    results = {}
    ticks = 0
    while pool.pending():
        for rid, out in pool.tick():
            results[rid] = out
        ticks += 1
        assert ticks < 300, "pool did not drain"
    for rid, p, b in zip(rids, prompts, budgets):
        assert results[rid] == _single(model, variables, p, b), (
            f"NSA request {rid} diverged"
        )


def test_pool_nsa_rejects_chunked_prefill():
    """NSA prefill is one teacher-forced forward; chunk-resumable NSA
    caches do not exist, so --prefill_chunk stays dense-only."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _nsa_fixture()
    with pytest.raises(ValueError, match="dense-causal"):
        DecodePool(model, variables, rows=2, prefill_chunk=8)
