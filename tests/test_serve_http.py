"""HTTP serving daemon: dynamic batching, ragged decode, error paths.

The server runs in-process on an ephemeral port; concurrent requests
with different prompt lengths must coalesce into one ragged batch and
each return the exact single-prompt greedy continuation.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SHAPE = [
    "--d_model", "32", "--num_layers", "1", "--num_heads", "2",
    "--num_experts", "2", "--no_nsa", "--seq_len", "32",
    "--max_new_tokens", "3", "--temperature", "0",
]


@pytest.fixture(scope="module")
def server():
    from forde_tpu.serve_http import add_server_args, make_server
    from forde_tpu.serve import build_parser

    args = add_server_args(build_parser()).parse_args([
        *SHAPE, "--port", "0", "--batch_window_ms", "1000",
        "--max_batch", "8",
    ])
    srv, batcher = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", batcher
    srv.shutdown()
    batcher.stop()
    srv.server_close()


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/generate", json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url, path):
    with urllib.request.urlopen(url + path, timeout=30) as r:
        return json.loads(r.read())


@pytest.mark.slow
def test_http_concurrent_mixed_lengths_batch_and_match_greedy(server):
    url, batcher = server
    assert _get(url, "/healthz")["status"] == "ok"

    prompts = [[5, 17, 20], [9, 9], [7, 3, 11, 8, 2]]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(url, {"prompt_ids": prompts[i]})

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(prompts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results), results

    # exactness: each row equals single-prompt greedy decoding
    from forde_tpu.models.generate import generate_cached

    for p, r in zip(prompts, results):
        single = np.asarray(generate_cached(
            batcher.model, batcher.variables, jnp.asarray([p], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=3, temperature=0,
        ))[0].tolist()
        assert r["output_ids"] == single
        assert r["prompt_len"] == len(p)

    stats = _get(url, "/stats")
    assert stats["requests"] >= 3
    assert stats["rows_decoded"] >= 3
    assert stats["tokens_generated"] >= 9
    # the 1s batch window should have coalesced the concurrent requests
    # (compile happens inside the first batch, so they all queue behind it)
    assert stats["batches"] < stats["requests"]


def test_http_per_request_max_new_trims(server):
    url, _ = server
    r = _post(url, {"prompt_ids": [5, 17, 20], "max_new_tokens": 2})
    assert len(r["output_ids"]) == 5
    full = _post(url, {"prompt_ids": [5, 17, 20]})
    assert r["output_ids"] == full["output_ids"][:5]


def test_http_rejects_bad_requests(server):
    url, _ = server
    for payload in (
        {},  # no prompt
        {"prompt_ids": []},
        {"prompt_ids": ["a", "b"]},
        {"prompt_ids": [1, 2], "max_new_tokens": 99},  # > server max
        {"prompt_ids": list(range(1022))},  # > max_seq_len(1024) - max_new
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, payload)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        with urllib.request.urlopen(url + "/nope", timeout=30):
            pass
    assert e.value.code == 404


@pytest.fixture(scope="module")
def cont_server():
    from forde_tpu.serve_http import add_server_args, make_server
    from forde_tpu.serve import build_parser

    args = add_server_args(build_parser()).parse_args([
        *SHAPE, "--port", "0", "--continuous", "--max_batch", "2",
    ])
    srv, batcher = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", batcher
    srv.shutdown()
    batcher.stop()
    srv.server_close()


def test_http_continuous_batching_exact_and_overlapping(cont_server):
    """Continuous mode: more concurrent requests than pool rows, with
    different budgets — every response equals single-prompt greedy and
    the pool must have run with multiple active rows."""
    url, batcher = cont_server
    assert _get(url, "/healthz")["status"] == "ok"

    prompts = [[5, 17, 20], [9, 9], [7, 3, 11, 8, 2]]
    budgets = [3, 2, 3]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(
            url, {"prompt_ids": prompts[i], "max_new_tokens": budgets[i]}
        )

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(prompts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results), results

    from forde_tpu.models.generate import generate_cached

    for p, b, r in zip(prompts, budgets, results):
        single = np.asarray(generate_cached(
            batcher.model, batcher.variables, jnp.asarray([p], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=b, temperature=0,
        ))[0].tolist()
        assert r["output_ids"] == single

    stats = _get(url, "/stats")
    assert stats["requests"] >= 3
    assert stats["ticks"] >= 3
    assert stats["tokens_generated"] >= sum(budgets)
    assert stats["max_active_rows"] == 2  # the pool genuinely overlapped


@pytest.fixture(scope="module")
def fused_server():
    from forde_tpu.serve_http import add_server_args, make_server
    from forde_tpu.serve import build_parser

    args = add_server_args(build_parser()).parse_args([
        *SHAPE, "--port", "0", "--continuous", "--max_batch", "2",
        "--decode_fuse", "4",
    ])
    srv, batcher = make_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", batcher
    srv.shutdown()
    batcher.stop()
    srv.server_close()


@pytest.mark.slow
def test_http_continuous_fused_exact(fused_server):
    """--decode_fuse 4 through the full HTTP stack: overlapping requests
    whose budgets are NOT multiples of the fuse width (mid-scan budget
    exhaustion) still return exact single-prompt greedy tokens."""
    url, batcher = fused_server
    prompts = [[5, 17, 20], [9, 9], [7, 3, 11, 8, 2]]
    budgets = [3, 2, 3]  # all < fuse width
    results = [None] * len(prompts)

    def worker(i):
        results[i] = _post(
            url, {"prompt_ids": prompts[i], "max_new_tokens": budgets[i]}
        )

    threads = [
        threading.Thread(target=worker, args=(i,))
        for i in range(len(prompts))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None for r in results), results

    from forde_tpu.models.generate import generate_cached

    for p, b, r in zip(prompts, budgets, results):
        single = np.asarray(generate_cached(
            batcher.model, batcher.variables, jnp.asarray([p], jnp.int32),
            jax.random.PRNGKey(0), max_new_tokens=b, temperature=0,
        ))[0].tolist()
        assert r["output_ids"] == single
