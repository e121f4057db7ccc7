"""Per-request sampling in the continuous pool.

``sample_rows`` traces temperature/top-k/top-p as per-row tensors, so
mixed sampling settings share one compiled step program. It must match
the static ``_sample``/``_filter_logits`` path bit-for-bit for uniform
rows, and deterministic filter settings (top_k=1, tiny top_p) must
reduce to greedy through the whole pool.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import _sample, generate_cached, sample_rows
from tests.test_decoder_model import tiny_config


@pytest.mark.parametrize(
    "temp,top_k,top_p",
    [
        (1.0, None, None),
        (0.7, 5, None),
        (1.3, None, 0.8),
        (0.5, 7, 0.6),
        (0.0, 3, 0.9),  # greedy rows ignore the filters
    ],
)
def test_sample_rows_matches_static_sampler(temp, top_k, top_p):
    """Uniform per-row parameters must reproduce _sample exactly (same
    filtered logits -> same categorical draw under the same key)."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    key = jax.random.PRNGKey(7)
    want = _sample(logits, key, temp, top_k, top_p)
    got = sample_rows(
        logits, key,
        jnp.full((4,), temp, jnp.float32),
        None if top_k is None else jnp.full((4,), top_k, jnp.int32),
        None if top_p is None else jnp.full((4,), top_p, jnp.float32),
    )
    assert (np.asarray(want) == np.asarray(got)).all()


def test_sample_rows_mixed_rows_independent():
    """Each row obeys ITS OWN parameters: a greedy row and a top_k=1 row
    both argmax; a sampled row with no filter draws from the full dist."""
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(3, 32).astype(np.float32))
    key = jax.random.PRNGKey(3)
    got = np.asarray(sample_rows(
        logits, key,
        jnp.asarray([0.0, 1.0, 1.0], jnp.float32),
        jnp.asarray([0, 1, 0], jnp.int32),
        jnp.asarray([1.0, 1.0, 1e-9], jnp.float32),
    ))
    greedy = np.asarray(jnp.argmax(logits, axis=-1))
    assert got[0] == greedy[0]  # temp 0
    assert got[1] == greedy[1]  # top_k 1
    assert got[2] == greedy[2]  # nucleus of one token


def _fixture():
    cfg = tiny_config(use_sparse_attention=False, max_seq_len=64)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return cfg, model, variables


@pytest.mark.slow
def test_pool_per_request_sampling_deterministic_configs():
    """Mixed per-request settings in ONE pool: every deterministic
    configuration (greedy / top_k=1 / nucleus-of-one) must equal the
    single-prompt greedy continuation."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(2)
    prompts = [rng.randint(1, cfg.vocab_size, (n,)).tolist()
               for n in (3, 5, 2, 4)]
    settings = [
        dict(temperature=0.0),
        dict(temperature=1.0, top_k=1),
        dict(temperature=0.7, top_p=1e-9),
        dict(temperature=0.0, top_k=9, top_p=0.5),  # greedy ignores filters
    ]
    pool = DecodePool(model, variables, rows=2, temperature=1.0)  # sampled
    rids = [pool.submit(p, max_new_tokens=4, **s)
            for p, s in zip(prompts, settings)]
    results, ticks = {}, 0
    while pool.pending():
        results.update(dict(pool.tick()))
        ticks += 1
        assert ticks < 200
    for rid, p in zip(rids, prompts):
        want = np.asarray(generate_cached(
            model, variables, jnp.asarray([p], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=4, temperature=0,
        ))[0].tolist()
        assert results[rid] == want, rid


def test_pool_default_sampling_unchanged():
    """Requests without overrides use the pool default (greedy pool ->
    greedy rows), and the no-filter step program is used."""
    from forde_tpu.models import decode_pool
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    rid = pool.submit([5, 17, 20], max_new_tokens=3)
    results = {}
    while pool.pending():
        results.update(dict(pool.tick()))
    want = np.asarray(generate_cached(
        model, variables, jnp.asarray([[5, 17, 20]], jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=3, temperature=0,
    ))[0].tolist()
    assert results[rid] == want
    assert (pool.topks == 0).all() and (pool.topps == 1.0).all()


SHAPE = [
    "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
    "--num_experts", "2", "--no_nsa", "--seq_len", "64",
    "--max_new_tokens", "4",
]


def _make_server(extra):
    from forde_tpu.serve import build_parser
    from forde_tpu.serve_http import add_server_args, make_server

    args = add_server_args(build_parser()).parse_args([
        *SHAPE, "--port", "0", "--batch_window_ms", "30",
        "--max_batch", "4", *extra,
    ])
    srv, batcher = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    return srv, batcher, f"http://{host}:{port}"


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/generate", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_http_per_request_sampling():
    """A sampled continuous server must honor a per-request greedy
    override; batch mode rejects per-request sampling with 400."""
    srv, batcher, url = _make_server(["--continuous", "--temperature", "1"])
    try:
        res = _post(url, {"prompt_ids": [5, 17, 20], "temperature": 0})
        want = np.asarray(generate_cached(
            batcher.model, batcher.variables,
            jnp.asarray([[5, 17, 20]], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=4, temperature=0,
        ))[0].tolist()
        assert res["output_ids"] == want
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()

    srv, batcher, url = _make_server(["--temperature", "0"])
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"prompt_ids": [5, 17], "temperature": 0.5})
        assert e.value.code == 400
        assert "continuous" in json.loads(e.value.read())["error"]
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()
