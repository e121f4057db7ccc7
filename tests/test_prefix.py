"""Prefix caching (shared system prompt) + token streaming.

A prefix cache from ``prefill_prefix`` must make every downstream path —
``generate_cached``, ``generate_ragged``, ``DecodePool`` — produce
EXACTLY what decoding the concatenated (prefix + prompt) produces:
dense-causal K/V depend only on their own position's input, so the split
prefill is the same math, not an approximation. The streaming callback
must deliver precisely the continuation tokens in order.
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
from forde_tpu.models.generate import (
    generate_cached,
    generate_ragged,
    prefill_prefix,
)
from tests.test_decoder_model import tiny_config


def _fixture(scan_layers=False, **kw):
    cfg = tiny_config(
        use_sparse_attention=False, max_seq_len=64,
        scan_layers=scan_layers, **kw,
    )
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return cfg, model, variables


def _concat_greedy(model, variables, prompt, new):
    return np.asarray(generate_cached(
        model, variables, jnp.asarray([prompt], jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
    ))[0].tolist()


@pytest.mark.slow
@pytest.mark.parametrize("scan_layers", [False, True])
def test_generate_cached_prefix_token_exact(scan_layers):
    """prefix cache + suffix == concatenated prompt, both layer layouts,
    with MoE + mHC on (the stats/stream paths must not perturb decode)."""
    cfg, model, variables = _fixture(scan_layers=scan_layers)
    rng = np.random.RandomState(0)
    prefix = rng.randint(1, cfg.vocab_size, (7,)).tolist()
    sufs = rng.randint(1, cfg.vocab_size, (2, 5)).tolist()

    pc = prefill_prefix(model, variables, jnp.asarray([prefix], jnp.int32))
    out = np.asarray(generate_cached(
        model, variables, jnp.asarray(sufs, jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=6, temperature=0,
        prefix_cache=pc,
    ))
    for i, s in enumerate(sufs):
        want = _concat_greedy(model, variables, prefix + s, 6)[len(prefix):]
        assert out[i].tolist() == want, (scan_layers, i)


def test_generate_cached_prefix_rejects_nsa():
    cfg = tiny_config(use_sparse_attention=True, max_seq_len=64)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    with pytest.raises(ValueError, match="dense-causal"):
        prefill_prefix(model, variables, jnp.asarray([[1, 2, 3]], jnp.int32))
    dense_cfg, dense_model, dense_vars = _fixture()
    pc = prefill_prefix(
        dense_model, dense_vars, jnp.asarray([[1, 2, 3]], jnp.int32)
    )
    with pytest.raises(ValueError, match="dense-causal"):
        generate_cached(
            model, variables, jnp.asarray([[4, 5]], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=2, temperature=0,
            prefix_cache=pc,
        )


@pytest.mark.slow
def test_generate_ragged_prefix_token_exact():
    """Mixed-length suffixes under one shared prefix, ONE program — every
    row equals its concatenated single-prompt greedy decode."""
    cfg, model, variables = _fixture(scan_layers=True)
    rng = np.random.RandomState(1)
    prefix = rng.randint(1, cfg.vocab_size, (9,)).tolist()
    sufs = [rng.randint(1, cfg.vocab_size, (n,)).tolist() for n in (3, 6, 1)]
    lens = np.array([len(s) for s in sufs], np.int32)
    padded = np.zeros((len(sufs), int(lens.max())), np.int32)
    for i, s in enumerate(sufs):
        padded[i, : len(s)] = s

    pc = prefill_prefix(model, variables, jnp.asarray([prefix], jnp.int32))
    out = np.asarray(generate_ragged(
        model, variables, jnp.asarray(padded), jnp.asarray(lens),
        jax.random.PRNGKey(0), max_new_tokens=5, temperature=0,
        prefix_cache=pc,
    ))
    for i, s in enumerate(sufs):
        want = _concat_greedy(model, variables, prefix + s, 5)[len(prefix):]
        assert out[i, : len(s) + 5].tolist() == want, i


@pytest.mark.slow
def test_decode_pool_prefix_and_streaming_exact():
    """Pool requests with a registered prefix — INCLUDING slot reuse
    (more requests than rows) — match concatenated decoding; the
    on_token callback streams exactly the continuation, in order."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture(scan_layers=False)
    rng = np.random.RandomState(2)
    prefix = rng.randint(1, cfg.vocab_size, (6,)).tolist()
    sufs = [rng.randint(1, cfg.vocab_size, (n,)).tolist()
            for n in (3, 5, 2, 4, 7)]
    budgets = [4, 2, 5, 3, 4]

    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    pid = pool.register_prefix(prefix)
    streamed = {}

    def cb(rid, tok):
        streamed.setdefault(rid, []).append(tok)

    rids = [
        pool.submit(s, max_new_tokens=b, prefix_id=pid, on_token=cb)
        for s, b in zip(sufs, budgets)
    ]
    results, ticks = {}, 0
    while pool.pending():
        for rid, out in pool.tick():
            results[rid] = out
        ticks += 1
        assert ticks < 200, "pool did not drain"

    for rid, s, b in zip(rids, sufs, budgets):
        want = _concat_greedy(model, variables, prefix + s, b)[len(prefix):]
        assert results[rid] == want, rid
        assert streamed[rid] == want[len(s):], rid  # continuation only


@pytest.mark.slow
def test_decode_pool_prefix_budget_guard():
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    pool = DecodePool(model, variables, rows=1, temperature=0.0)
    pid = pool.register_prefix(list(range(1, 40)))  # 39 tokens of 64
    with pytest.raises(AssertionError, match="max_seq_len"):
        pool.submit([1] * 20, max_new_tokens=10, prefix_id=pid)
    # and the suffix bucket may not spill past the cache end
    rid = pool.submit([1] * 20, max_new_tokens=5, prefix_id=pid)
    results = {}
    while pool.pending():
        results.update(dict(pool.tick()))
    want = _concat_greedy(
        model, variables, list(range(1, 40)) + [1] * 20, 5
    )[39:]
    assert results[rid] == want


@pytest.mark.slow
def test_serve_cli_prefix_ids(tmp_path, capsys):
    """--prefix_ids: single-prompt and ragged batch paths both reuse the
    prefix and print prompt + continuation only."""
    from forde_tpu import serve

    base = [
        "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
        "--num_experts", "2", "--no_nsa", "--seq_len", "64",
        "--max_new_tokens", "3", "--temperature", "0",
    ]
    serve.main([*base, "--prompt_ids", "5,17,20", "--prefix_ids", "8,1,9"])
    out = capsys.readouterr().out
    assert "shared prefix prefilled once (3 tokens)" in out
    ids = eval(out.split("token ids:")[1].splitlines()[0])
    assert ids[:3] == [5, 17, 20] and len(ids) == 6

    pf = tmp_path / "prompts.txt"
    pf.write_text("5,17,20\n9,9\n")
    serve.main([
        *base, "--prompts_file", str(pf), "--prefix_ids", "8,1,9",
    ])
    out2 = capsys.readouterr().out
    line0 = eval(out2.split("[0] token ids:")[1].splitlines()[0])
    assert line0 == ids  # ragged batch row == single-prompt path


SHAPE = [
    "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
    "--num_experts", "2", "--no_nsa", "--seq_len", "64",
    "--max_new_tokens", "4", "--temperature", "0",
]


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/generate", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


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


def test_http_system_prefix_both_modes():
    """The server-level system prefix yields identical outputs through
    the ragged Batcher and the continuous pool, and both match local
    prefix-cached decoding."""
    outs = {}
    for extra in ([], ["--continuous"]):
        srv, batcher, url = _make_server(["--prefix_ids", "8,1,9", *extra])
        try:
            res = _post(url, {"prompt_ids": [5, 17, 20]})
            outs[bool(extra)] = res["output_ids"]
        finally:
            srv.shutdown()
            batcher.stop()
            srv.server_close()
        # reference: local prefix-cached greedy decode
        model, variables = batcher.model, batcher.variables
        want = _concat_greedy(
            model, variables, [8, 1, 9, 5, 17, 20], 4
        )[3:]
        assert res["output_ids"] == want, extra
    assert outs[False] == outs[True]


def test_http_sse_streaming():
    """{"stream": true} returns SSE events whose tokens reassemble the
    final output; non-continuous servers reject streaming."""
    srv, batcher, url = _make_server(["--continuous"])
    try:
        req = urllib.request.Request(
            url + "/generate",
            json.dumps({"prompt_ids": [5, 17, 20], "stream": True}).encode(),
            {"Content-Type": "application/json"},
        )
        events = []
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for raw in r:
                line = raw.decode().strip()
                if line.startswith("data: "):
                    events.append(json.loads(line[len("data: "):]))
        assert events[-1]["done"] is True
        toks = [e["token"] for e in events[:-1]]
        assert events[-1]["output_ids"] == [5, 17, 20] + toks
        assert toks == _concat_greedy(
            batcher.model, batcher.variables, [5, 17, 20], 4
        )[3:]
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()

    srv, batcher, url = _make_server([])  # batch mode: no streaming
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"prompt_ids": [5, 17], "stream": True})
        assert e.value.code == 400
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()
