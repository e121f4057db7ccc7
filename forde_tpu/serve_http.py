"""HTTP serving daemon: dynamic batching over the ragged decoder.

The reference repo is training-only; this is the online-serving surface
on top of the batch engine (``models/generate.generate_ragged``):

  python -m forde_tpu.serve_http --checkpoint_dir runs/ckpt --port 8000

  POST /generate   {"prompt_ids": [1,2,3], "max_new_tokens": 16}
                -> {"output_ids": [...], "prompt_len": 3, "batch_rows": 4}
  GET  /healthz -> {"status": "ok", ...model/config summary...}
  GET  /stats   -> request/batch/token counters

Requests land in a queue; ONE decode worker drains it into batches —
it takes the first request, then waits up to ``--batch_window_ms`` for
stragglers (at most ``--max_batch`` rows) — and decodes every request
in the batch in a single program. Mixed prompt lengths are free for
dense-causal configs: the batch is right-padded and decoded RAGGED
(per-row cache positions). To keep the set of compiled programs small,
shapes are bucketed — prompt length and row count each round up to a
power of two — so at most log2(max_seq_len) x log2(max_batch) distinct
executables exist, each compiled once (and the persistent XLA cache
makes them survive restarts).

NSA configs (the reference's DEFAULT) go through the SAME ragged path:
the length-aware NSA prefill builds each row's streaming caches at its
true length inside the padded bucket, and decode advances per-row
positions — the pow2 bucketing (bounded compile set) holds for every
architecture flag.

Sampling parameters (temperature/top-k/top-p/eos) are server-level
flags in BATCH mode: they are compile-time constants of the decode
program, so per-request values would defeat the shape bucketing. In
``--continuous`` mode the pool traces them PER ROW
(``models/generate.sample_rows``), so requests may carry their own
``temperature``/``top_k``/``top_p`` at zero recompile cost. Per-request
``max_new_tokens`` (<= the server's ``--max_new_tokens``) is honored
by trimming: the program always runs the server maximum.

``--continuous`` switches to CONTINUOUS batching (dense and NSA
configs): requests join and leave a fixed-capacity decode pool at token
granularity (``models/decode_pool.DecodePool``) — no batch boundaries,
short requests finish early, and a freed slot is refilled on the next
scheduler tick. Per-request ``max_new_tokens`` then bounds the actual
decode work, not just the trim.

``--prefix_ids`` (dense configs) installs a SYSTEM PREFIX: prefilled
once at startup (``models/generate.prefill_prefix``), its K/V reused by
every request — requests send and receive only their own prompt +
continuation. Works in both batch modes (ragged ``prefix_cache`` /
pool ``register_prefix``). In continuous mode prefixes can also be
registered AT RUNTIME: ``POST /prefix {"prefix_ids": [...]}`` returns a
``prefix_id`` later /generate bodies reference — one prefill forward
per distinct prefix, however many requests share it.

Disconnected clients don't waste decode work: an SSE consumer that
drops mid-stream has its pool slot freed on the next scheduler tick
(``DecodePool.cancel``).

``{"stream": true}`` in a /generate body (continuous mode only) switches
the response to server-sent events: one ``data: {"token": t}`` event per
sampled token as the pool emits it, then a final
``data: {"output_ids": [...], "done": true}`` event.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from forde_tpu.serve import build_parser, load_serving_model


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _server_prefix(model, variables, args):
    """--prefix_ids as a SERVER-level system prompt: prefilled once at
    startup, reused by every request (models/generate.prefill_prefix).
    Returns (prefix_cache | None, prefix_len)."""
    if not getattr(args, "prefix_ids", None):
        return None, 0
    from forde_tpu.models.generate import prefill_prefix

    prefix = [int(t) for t in args.prefix_ids.split(",")]
    cache = prefill_prefix(
        model, variables, jnp.asarray([prefix], jnp.int32)
    )
    print(f"[serve_http] system prefix prefilled once "
          f"({len(prefix)} tokens)")
    return cache, len(prefix)


@dataclass
class _Pending:
    prompt: list
    max_new: int
    done: threading.Event = field(default_factory=threading.Event)
    output: Optional[list] = None
    error: Optional[str] = None
    batch_rows: int = 0
    # SSE streaming (continuous mode): tokens land here as they are
    # sampled; None is the end-of-stream sentinel
    stream: Optional["queue.Queue"] = None
    # per-request sampling overrides (continuous mode only — the pool
    # traces them per row, so they cost no recompiles; None = server flag)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # per-request prefix (continuous mode): id from POST /prefix;
    # None = the server-level --prefix_ids prefix (if any)
    prefix_id: Optional[int] = None
    # cancellation (continuous mode): set when the client disconnects
    rid: Optional[int] = None  # pool request id once admitted
    cancelled: bool = False


class Batcher:
    """Queue + single decode worker. ``submit`` blocks the (per-request
    handler) thread until its row is decoded."""

    def __init__(self, config, model, variables, args):
        self.config = config
        self.model = model
        self.variables = variables
        self.args = args
        self.prefix_cache, self.prefix_len = _server_prefix(
            model, variables, args
        )
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {
            "requests": 0,
            "batches": 0,
            "rows_decoded": 0,
            "rows_padding": 0,
            "tokens_generated": 0,
            "max_batch_rows": 0,
        }
        self._lock = threading.Lock()
        self._running = True
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompt: list, max_new: int) -> _Pending:
        req = _Pending(prompt=prompt, max_new=max_new)
        with self._lock:
            self.stats["requests"] += 1
        self.queue.put(req)
        req.done.wait()
        return req

    def stop(self):
        self._running = False
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------

    def _run(self):
        window = self.args.batch_window_ms / 1000.0
        while self._running:
            try:
                first = self.queue.get(timeout=0.2)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + window
            while len(batch) < self.args.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                self._decode(batch)
            except Exception as e:  # surface, don't kill the worker
                for req in batch:
                    req.error = f"{type(e).__name__}: {e}"
            for req in batch:
                req.done.set()

    def _decode(self, batch):
        with self._lock:
            self.stats["batches"] += 1
            self.stats["rows_decoded"] += len(batch)
            self.stats["max_batch_rows"] = max(
                self.stats["max_batch_rows"], len(batch)
            )
        # one path for every architecture flag: NSA rows prefill through
        # the length-aware nsa_prefill inside generate_ragged, so the
        # pow2 shape bucketing (bounded compile set) holds for NSA too
        self._decode_ragged(batch)
        with self._lock:
            self.stats["tokens_generated"] += sum(
                len(r.output) - len(r.prompt)
                for r in batch
                if r.output is not None
            )

    def _decode_ragged(self, batch):
        from forde_tpu.models.generate import generate_ragged

        args, config = self.args, self.config
        lens = np.array([len(r.prompt) for r in batch], np.int32)
        # shape buckets: pow2 prompt length and row count -> bounded
        # compile set; pad rows repeat row 0 and are discarded
        pmax = min(
            _next_pow2(int(lens.max())),
            config.max_seq_len - args.max_new_tokens - self.prefix_len,
        )
        rows = _next_pow2(len(batch))
        with self._lock:
            self.stats["rows_padding"] += rows - len(batch)
        padded = np.full((rows, pmax), args.pad_id, np.int32)
        all_lens = np.full((rows,), int(lens[0]), np.int32)
        for i, r in enumerate(batch):
            padded[i, : len(r.prompt)] = r.prompt
            all_lens[i] = len(r.prompt)
        padded[len(batch):, : len(batch[0].prompt)] = batch[0].prompt
        key = jax.random.fold_in(
            jax.random.PRNGKey(args.seed), self.stats["batches"]
        )
        out = np.asarray(generate_ragged(
            self.model, self.variables, jnp.asarray(padded),
            jnp.asarray(all_lens), key,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, eos_id=args.eos_id, pad_id=args.pad_id,
            prefix_cache=self.prefix_cache,
        ))
        for i, r in enumerate(batch):
            r.output = out[i, : len(r.prompt) + r.max_new].tolist()
            r.batch_rows = rows

class ContinuousBatcher:
    """Same submit() contract as Batcher, but token-granular: requests
    join the decode pool (models/decode_pool.DecodePool) the moment a
    slot is free — nobody waits for a batch boundary, and short requests
    leave early. ``--max_batch`` is the pool's row capacity."""

    def __init__(self, config, model, variables, args):
        from forde_tpu.models.decode_pool import DecodePool

        self.config = config
        self.model = model
        self.variables = variables
        self.args = args
        self.pool = DecodePool(
            model, variables, rows=args.max_batch,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, seed=args.seed,
            prefill_chunk=args.prefill_chunk,
            decode_fuse=getattr(args, "decode_fuse", 1) or 1,
        )
        self._prefix_id, self.prefix_len = None, 0
        if getattr(args, "prefix_ids", None):
            prefix = [int(t) for t in args.prefix_ids.split(",")]
            self._prefix_id = self.pool.register_prefix(prefix)
            self.prefix_len = len(prefix)
            print(f"[serve_http] system prefix registered with the pool "
                  f"({self.prefix_len} tokens)")
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self._cancel_q: "queue.Queue[_Pending]" = queue.Queue()
        self._inflight = {}
        self.stats = {
            "requests": 0,
            "ticks": 0,
            "max_active_rows": 0,
            "tokens_generated": 0,
        }
        self._lock = threading.Lock()
        self._running = True
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompt: list, max_new: int, **sampling) -> _Pending:
        req = _Pending(prompt=prompt, max_new=max_new, **sampling)
        with self._lock:
            self.stats["requests"] += 1
        self.queue.put(req)
        req.done.wait()
        return req

    def submit_stream(self, prompt: list, max_new: int, **sampling) -> _Pending:
        """Non-blocking submit for SSE: tokens arrive on ``req.stream``
        as they are sampled (None = end of stream; ``req.output`` /
        ``req.error`` are final once the sentinel lands)."""
        req = _Pending(
            prompt=prompt, max_new=max_new, stream=queue.Queue(), **sampling
        )
        with self._lock:
            self.stats["requests"] += 1
        self.queue.put(req)
        return req

    def stop(self):
        self._running = False
        self._worker.join(timeout=5)

    def register_prefix(self, prefix_ids: list) -> tuple:
        """Runtime prefix registration (POST /prefix): one prefill
        forward now, reusable by any later request via ``prefix_id``.
        Returns (prefix_id, prefix_len). Append-only pool state — safe
        from handler threads."""
        pid = self.pool.register_prefix(prefix_ids)
        return pid, len(prefix_ids)

    def prefix_len_for(self, prefix_id: Optional[int]) -> int:
        if prefix_id is None:
            return self.prefix_len
        return self.pool.prefix_len(prefix_id)

    def cancel(self, req: _Pending):
        """Client went away: route the cancellation to the worker thread
        (the only thread allowed to mutate pool scheduling state)."""
        self._cancel_q.put(req)

    def _admit(self, req: _Pending):
        if req.cancelled:
            req.done.set()
            return
        on_token = None
        if req.stream is not None:
            on_token = lambda rid, tok, q=req.stream: q.put(tok)  # noqa: E731
        rid = self.pool.submit(
            req.prompt, req.max_new, eos_id=self.args.eos_id,
            prefix_id=(
                req.prefix_id if req.prefix_id is not None
                else self._prefix_id
            ),
            on_token=on_token,
            temperature=req.temperature, top_k=req.top_k, top_p=req.top_p,
        )
        req.rid = rid
        self._inflight[rid] = req

    def _drain_cancels(self):
        while True:
            try:
                req = self._cancel_q.get_nowait()
            except queue.Empty:
                return
            req.cancelled = True  # _admit will skip it if still queued
            if req.rid is not None and req.rid in self._inflight:
                self.pool.cancel(req.rid)
                self._inflight.pop(req.rid)
                if req.stream is not None:
                    req.stream.put(None)
                req.done.set()

    def _run(self):
        while self._running:
            try:
                self._drain_cancels()
                if self.pool.pending():
                    while True:
                        try:
                            self._admit(self.queue.get_nowait())
                        except queue.Empty:
                            break
                    done = self.pool.tick()
                    with self._lock:
                        self.stats["ticks"] += 1
                        self.stats["max_active_rows"] = max(
                            self.stats["max_active_rows"],
                            self.pool.last_step_rows,
                        )
                    for rid, out in done:
                        req = self._inflight.pop(rid)
                        req.output = out
                        req.batch_rows = self.pool.rows
                        with self._lock:
                            self.stats["tokens_generated"] += (
                                len(out) - len(req.prompt)
                            )
                        if req.stream is not None:
                            req.stream.put(None)  # end-of-stream sentinel
                        req.done.set()
                else:
                    try:
                        self._admit(self.queue.get(timeout=0.2))
                    except queue.Empty:
                        continue
            except Exception as e:  # fail inflight, keep serving
                from forde_tpu.models.decode_pool import DecodePool

                err = f"{type(e).__name__}: {e}"
                for req in self._inflight.values():
                    req.error = err
                    if req.stream is not None:
                        req.stream.put(None)
                    req.done.set()
                self._inflight.clear()
                self.pool = DecodePool(
                    self.model, self.variables, rows=self.args.max_batch,
                    temperature=self.args.temperature,
                    top_k=self.args.top_k, top_p=self.args.top_p,
                    seed=self.args.seed,
                    prefill_chunk=self.args.prefill_chunk,
                    decode_fuse=getattr(self.args, "decode_fuse", 1) or 1,
                )
                if self._prefix_id is not None:
                    prefix = [
                        int(t) for t in self.args.prefix_ids.split(",")
                    ]
                    self._prefix_id = self.pool.register_prefix(prefix)


class _Handler(BaseHTTPRequestHandler):
    batcher: Batcher = None  # set by make_server
    quiet: bool = True

    def log_message(self, fmt, *a):  # stdlib default spams stderr
        if not self.quiet:
            super().log_message(fmt, *a)

    def _send(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        b = self.batcher
        if self.path == "/healthz":
            cfg = b.config
            self._send(200, {
                "status": "ok",
                "d_model": cfg.d_model,
                "num_layers": cfg.num_layers,
                "nsa": cfg.use_sparse_attention,
                "max_seq_len": cfg.max_seq_len,
                "max_new_tokens": b.args.max_new_tokens,
                "system_prefix_len": b.prefix_len,
            })
        elif self.path == "/stats":
            with b._lock:
                self._send(200, dict(b.stats))
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        if self.path == "/prefix":
            self._register_prefix()
            return
        if self.path != "/generate":
            self._send(404, {"error": "unknown path"})
            return
        b = self.batcher
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            prompt = req.get("prompt_ids")
            if (
                not isinstance(prompt, list)
                or not prompt
                or not all(isinstance(t, int) and t >= 0 for t in prompt)
            ):
                raise ValueError("prompt_ids must be a non-empty list of "
                                 "non-negative ints")
            max_new = int(req.get("max_new_tokens", b.args.max_new_tokens))
            if not 1 <= max_new <= b.args.max_new_tokens:
                raise ValueError(
                    f"max_new_tokens must be in [1, {b.args.max_new_tokens}] "
                    "(the server's compiled maximum)"
                )
            prefix_id = req.get("prefix_id")
            if prefix_id is not None:
                if not hasattr(b, "register_prefix"):
                    raise ValueError("prefix_id requires --continuous")
                prefix_id = int(prefix_id)
                try:
                    plen = b.prefix_len_for(prefix_id)
                except IndexError:
                    raise ValueError(f"unknown prefix_id {prefix_id} "
                                     "(register via POST /prefix)")
            else:
                plen = b.prefix_len
            limit = b.config.max_seq_len - b.args.max_new_tokens - plen
            if len(prompt) > limit:
                raise ValueError(
                    f"prompt length {len(prompt)} > {limit} "
                    "(max_seq_len - server max_new_tokens - prefix)"
                )
            stream = bool(req.get("stream", False))
            if stream and not hasattr(b, "submit_stream"):
                raise ValueError(
                    "streaming requires the server to run with --continuous "
                    "(token-granular decoding)"
                )
            sampling = {}
            for name, cast in (
                ("temperature", float), ("top_k", int), ("top_p", float),
            ):
                if req.get(name) is not None:
                    sampling[name] = cast(req[name])
            if sampling and not hasattr(b, "submit_stream"):
                raise ValueError(
                    "per-request sampling parameters require --continuous "
                    "(batch mode compiles server-level sampling constants)"
                )
            if sampling.get("top_p") is not None and not (
                0.0 < sampling["top_p"] <= 1.0
            ):
                raise ValueError("top_p must be in (0, 1]")
            if sampling.get("temperature", 1.0) < 0:
                raise ValueError("temperature must be >= 0")
            if sampling.get("top_k", 0) < 0:
                raise ValueError("top_k must be >= 0")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return
        if prefix_id is not None:
            sampling["prefix_id"] = prefix_id
        if stream:
            self._stream(b, prompt, max_new, sampling)
            return
        res = b.submit(prompt, max_new, **sampling)
        if res.error is not None:
            self._send(500, {"error": res.error})
        else:
            self._send(200, {
                "output_ids": res.output,
                "prompt_len": len(prompt),
                "batch_rows": res.batch_rows,
            })

    def _stream(self, b, prompt, max_new, sampling):
        """Server-sent events: one ``data: {"token": t}`` event per
        sampled token, then a final ``data: {"output_ids": ..., "done":
        true}`` event. Tokens flush as the pool produces them."""
        res = b.submit_stream(prompt, max_new, **sampling)
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Connection", "close")
        self.end_headers()
        try:
            while True:
                tok = res.stream.get()
                if tok is None:
                    break
                self.wfile.write(
                    f"data: {json.dumps({'token': tok})}\n\n".encode()
                )
                self.wfile.flush()
            res.done.wait()
            if res.error is not None:
                final = {"error": res.error, "done": True}
            else:
                final = {
                    "output_ids": res.output,
                    "prompt_len": len(prompt),
                    "done": True,
                }
            self.wfile.write(f"data: {json.dumps(final)}\n\n".encode())
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            # client went away mid-stream: free the decode slot instead
            # of finishing a row nobody will read
            if hasattr(b, "cancel"):
                b.cancel(res)

    def _register_prefix(self):
        """POST /prefix {"prefix_ids": [...]} -> {"prefix_id", "prefix_len"}:
        runtime shared-prefix registration (continuous mode). One prefill
        forward now; later /generate bodies pass ``prefix_id``."""
        b = self.batcher
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            prefix = req.get("prefix_ids")
            if (
                not isinstance(prefix, list)
                or not prefix
                or not all(isinstance(t, int) and t >= 0 for t in prefix)
            ):
                raise ValueError("prefix_ids must be a non-empty list of "
                                 "non-negative ints")
            if not hasattr(b, "register_prefix"):
                raise ValueError("prefix registration requires --continuous")
            limit = b.config.max_seq_len - b.args.max_new_tokens - 1
            if len(prefix) > limit:
                raise ValueError(f"prefix length {len(prefix)} > {limit}")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
            return
        pid, plen = b.register_prefix(prefix)
        self._send(200, {"prefix_id": pid, "prefix_len": plen})


def add_server_args(p):
    p.add_argument("--port", type=int, default=8000,
                   help="0 picks a free port (printed at startup)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--max_batch", type=int, default=32,
                   help="max requests decoded in one program")
    p.add_argument("--batch_window_ms", type=float, default=30.0,
                   help="after the first queued request, wait this long "
                        "for more before decoding")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching: requests join/leave the "
                        "decode pool at TOKEN granularity (no batch "
                        "boundaries; --max_batch = pool rows; dense AND "
                        "NSA configs)")
    p.add_argument("--prefill_chunk", type=int, default=None,
                   help="continuous mode: prefill prompts in fixed-size "
                        "chunks, one per scheduler tick — a long prompt "
                        "then delays active rows by one chunk per tick "
                        "instead of its whole prefill (token-exact)")
    p.add_argument("--decode_fuse", type=int, default=1,
                   help="continuous mode: decode k tokens per dispatch "
                        "(one scanned program) — amortizes per-dispatch "
                        "latency; admission waits at most k-1 decode "
                        "steps and streamed tokens arrive in bursts of "
                        "up to k")
    return p


def make_server(args):
    """Build (ThreadingHTTPServer, Batcher) without serving — the test
    entry; ``main`` wraps it with serve_forever."""
    config, model, variables = load_serving_model(args)
    if args.beam_size > 1 or args.draft_checkpoint_dir:
        raise SystemExit("serve_http composes with greedy/sampled cached "
                         "decode only")
    if getattr(args, "prefix_ids", None) and config.use_sparse_attention:
        raise SystemExit("--prefix_ids requires a dense-causal config "
                         "(NSA caches depend on what follows the prefix)")
    if args.continuous:
        if config.use_sparse_attention and args.prefill_chunk:
            raise SystemExit("--prefill_chunk requires a dense-causal "
                             "config (the NSA prefill is one "
                             "teacher-forced forward)")
        batcher = ContinuousBatcher(config, model, variables, args)
    else:
        batcher = Batcher(config, model, variables, args)
    handler = type("Handler", (_Handler,), {"batcher": batcher})
    server = ThreadingHTTPServer((args.host, args.port), handler)
    return server, batcher


def main(argv: Optional[list] = None) -> None:
    args = add_server_args(build_parser()).parse_args(argv)
    server, batcher = make_server(args)
    host, port = server.server_address[:2]
    print(f"[serve_http] serving on http://{host}:{port} "
          f"(max_batch={args.max_batch}, "
          f"window={args.batch_window_ms}ms, "
          f"max_new_tokens={args.max_new_tokens})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.stop()
        server.server_close()


if __name__ == "__main__":
    main()
