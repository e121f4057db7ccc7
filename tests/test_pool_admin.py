"""Pool administration: request cancellation + runtime prefix registration.

Cancelling must free the slot for later work without perturbing any
other request's tokens; a runtime-registered prefix must behave exactly
like a startup prefix.
"""

import pytest
import json
import socket
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.models.decoder_lm import FORDEDecoderLM
from forde_tpu.models.generate import generate_cached
from tests.test_decoder_model import tiny_config


def _fixture():
    cfg = tiny_config(use_sparse_attention=False, max_seq_len=64)
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return cfg, model, variables


def _greedy(model, variables, prompt, new):
    return np.asarray(generate_cached(
        model, variables, jnp.asarray([prompt], jnp.int32),
        jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
    ))[0].tolist()


@pytest.mark.slow
def test_pool_cancel_queued_and_active():
    """Cancel one queued and one active request; the remaining requests
    drain to exactly their greedy continuations and the cancelled ids
    are never reported."""
    from forde_tpu.models.decode_pool import DecodePool

    cfg, model, variables = _fixture()
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, cfg.vocab_size, (n,)).tolist()
               for n in (3, 4, 5, 2)]

    pool = DecodePool(model, variables, rows=2, temperature=0.0)
    rids = [pool.submit(p, max_new_tokens=6) for p in prompts]

    # one tick: rids[0]/rids[1] occupy the two slots, rids[2]/[3] queued
    results = dict(pool.tick())
    assert pool.cancel(rids[1]) is True   # active slot
    assert pool.cancel(rids[2]) is True   # still queued
    assert pool.cancel(999) is False      # unknown id
    ticks = 0
    while pool.pending():
        results.update(dict(pool.tick()))
        ticks += 1
        assert ticks < 200
    assert set(results) == {rids[0], rids[3]}
    for rid, p in ((rids[0], prompts[0]), (rids[3], prompts[3])):
        assert results[rid] == _greedy(model, variables, p, 6), rid


SHAPE = [
    "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
    "--num_experts", "2", "--no_nsa", "--seq_len", "64",
    "--max_new_tokens", "4", "--temperature", "0",
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
    return srv, batcher, host, port


def _post(host, port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://{host}:{port}{path}", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.mark.slow
def test_http_runtime_prefix_registration():
    """POST /prefix then /generate with prefix_id == local prefix-cached
    greedy decode; two prefixes coexist."""
    srv, batcher, host, port = _make_server(["--continuous"])
    try:
        pa = _post(host, port, "/prefix", {"prefix_ids": [8, 1, 9]})
        pb = _post(host, port, "/prefix", {"prefix_ids": [2, 2, 2, 2]})
        assert pa["prefix_len"] == 3 and pb["prefix_len"] == 4
        assert pa["prefix_id"] != pb["prefix_id"]
        for pre, pid in (([8, 1, 9], pa["prefix_id"]),
                         ([2, 2, 2, 2], pb["prefix_id"])):
            res = _post(host, port, "/generate",
                        {"prompt_ids": [5, 17, 20], "prefix_id": pid})
            want = _greedy(
                batcher.model, batcher.variables, pre + [5, 17, 20], 4
            )[len(pre):]
            assert res["output_ids"] == want, pid
        # unknown prefix id -> 400
        import urllib.error

        try:
            _post(host, port, "/generate",
                  {"prompt_ids": [5], "prefix_id": 99})
            raise AssertionError("unknown prefix_id accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()


@pytest.mark.slow
def test_http_sse_disconnect_frees_slot():
    """Drop an SSE connection mid-stream on a 1-row pool; a follow-up
    request must still complete (the dead row was cancelled, not left
    holding the only slot)."""
    srv, batcher, host, port = _make_server(
        ["--continuous", "--max_batch", "1", "--max_new_tokens", "64"]
    )
    try:
        # raw socket so we can slam the connection after the first event
        body = json.dumps({"prompt_ids": [5, 17, 20], "stream": True})
        s = socket.create_connection((host, port), timeout=600)
        s.sendall(
            f"POST /generate HTTP/1.1\r\nHost: {host}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}".encode()
        )
        buf = b""
        while b"data: " not in buf:
            buf += s.recv(4096)
        s.close()  # client gone after the first token

        # the pool must recover the slot: this request needs it
        res = _post(host, port, "/generate",
                    {"prompt_ids": [9, 2], "max_new_tokens": 3})
        want = _greedy(batcher.model, batcher.variables, [9, 2], 3)
        assert res["output_ids"] == want

        # and the dead request is gone from the books
        deadline = 50
        while batcher._inflight and deadline:
            import time

            time.sleep(0.1)
            deadline -= 1
        assert not batcher._inflight
        # proof the dead row was CANCELLED, not decoded to its 64-token
        # budget: cancelled requests never reach the completion counter,
        # so only the follow-up's 3 tokens are on the books
        with batcher._lock:
            assert batcher.stats["tokens_generated"] == 3, batcher.stats
    finally:
        srv.shutdown()
        batcher.stop()
        srv.server_close()
