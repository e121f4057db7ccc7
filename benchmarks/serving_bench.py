"""Serving throughput: sequential vs ragged batch vs continuous pool.

Drives the decode engines directly (no HTTP overhead) on a synthetic
mixed workload — R requests with uniform prompt lengths and token
budgets — and prints one JSON line per mode:

  sequential  — generate_cached per request, one at a time (the
                baseline a naive user would write)
  ragged      — ONE generate_ragged program over the whole closed
                batch (everyone pays the longest budget)
  continuous  — DecodePool with all requests queued up front: slots
                refill the moment a row finishes, so the chip never
                idles on finished rows (and per-request budgets bound
                actual work)
  prefix      — the same pool workload where every request shares a
                --prefix_len system prompt: once WITHOUT prefix caching
                (each request prefills prefix+prompt) and once WITH
                (register_prefix amortizes the prefix forward across
                all requests; suffixes prefill at the offset)

Usage: python benchmarks/serving_bench.py [--requests 32] [--rows 8]
         [--d_model 256] [--num_layers 4] [--scan_layers] ...
Sync discipline: every timed section ends with a host transfer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(args):
    from forde_tpu.core.config import DTypePolicy, LLMConfig
    from forde_tpu.models.decoder_lm import FORDEDecoderLM

    cfg = LLMConfig(
        vocab_size=50_304,
        d_model=args.d_model,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        head_dim=args.d_model // args.num_heads,
        max_seq_len=args.max_seq_len,
        num_experts=args.num_experts,
        top_k_experts=2,
        expert_hidden_dim=4 * args.d_model,
        use_sparse_attention=args.nsa,
        window_size=args.nsa_window,
        compression_ratio=4,
        use_moe=args.num_experts > 1,
        use_hyper_connections=False,
        scan_layers=args.scan_layers,
        dropout_rate=0.0,
    )
    if args.bf16:
        cfg = cfg.replace(dtypes=DTypePolicy.bf16())
    model = FORDEDecoderLM(config=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )
    variables = {
        "params": variables["params"],
        "stats_buffer": variables.get("stats_buffer", {}),
    }
    return cfg, model, variables


def workload(args, cfg):
    """Mixed lengths/budgets drawn from pow2-ish grids so the SEQUENTIAL
    baseline compiles a bounded set of (prompt_len, budget) programs —
    otherwise its warmup is all remote-compiler time."""
    rng = np.random.RandomState(args.seed)

    def grid(lo, hi):
        g, v = [], lo
        while v <= hi:
            g.append(v)
            v *= 2
        return g

    lens = rng.choice(grid(args.min_prompt, args.max_prompt), args.requests)
    budgets = rng.choice(grid(args.min_new, args.max_new), args.requests)
    prompts = [
        rng.randint(1, cfg.vocab_size, (n,)).tolist() for n in lens
    ]
    return prompts, budgets


def run_sequential(model, variables, prompts, budgets, warm):
    from forde_tpu.models.generate import generate_cached

    def once():
        outs = []
        for p, b in zip(prompts, budgets):
            out = generate_cached(
                model, variables, jnp.asarray([p], jnp.int32),
                jax.random.PRNGKey(0), max_new_tokens=int(b), temperature=0,
            )
            outs.append(np.asarray(out))  # host sync
        return outs

    if warm:
        once()
    t0 = time.perf_counter()
    once()
    return time.perf_counter() - t0


def run_ragged(model, variables, prompts, budgets, warm):
    from forde_tpu.models.generate import generate_ragged

    lens = np.array([len(p) for p in prompts], np.int32)
    pmax = int(lens.max())
    new = int(budgets.max())  # a closed batch pays the longest budget
    padded = np.zeros((len(prompts), pmax), np.int32)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p

    def once():
        out = generate_ragged(
            model, variables, jnp.asarray(padded), jnp.asarray(lens),
            jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
        )
        return np.asarray(out)  # host sync

    if warm:
        once()
    t0 = time.perf_counter()
    once()
    return time.perf_counter() - t0


def run_pool(model, variables, prompts, budgets, rows, warm, chunk=None,
             fuse=1):
    from forde_tpu.models.decode_pool import DecodePool

    def once():
        pool = DecodePool(model, variables, rows=rows, temperature=0.0,
                          prefill_chunk=chunk, decode_fuse=fuse)
        for p, b in zip(prompts, budgets):
            pool.submit(p, max_new_tokens=int(b))
        n_done, ticks = 0, 0
        while pool.pending():
            n_done += len(pool.tick())
            ticks += 1
        assert n_done == len(prompts)
        return ticks

    if warm:
        once()
    t0 = time.perf_counter()
    ticks = once()
    return time.perf_counter() - t0, ticks


def run_prefix(model, variables, prompts, budgets, rows, plen, warm, seed):
    """Shared-prefix workload through the pool, with and without prefix
    caching. Returns (t_without, t_with)."""
    from forde_tpu.models.decode_pool import DecodePool

    rng = np.random.RandomState(seed + 1)
    prefix = rng.randint(1, 1000, (plen,)).tolist()

    def drain(pool, submit):
        for p, b in zip(prompts, budgets):
            submit(pool, p, int(b))
        n = 0
        while pool.pending():
            n += len(pool.tick())
        assert n == len(prompts)

    def without():
        pool = DecodePool(model, variables, rows=rows, temperature=0.0)
        drain(pool, lambda pl, p, b: pl.submit(
            prefix + p, max_new_tokens=b))

    def with_cache():
        pool = DecodePool(model, variables, rows=rows, temperature=0.0)
        pid = pool.register_prefix(prefix)
        drain(pool, lambda pl, p, b: pl.submit(
            p, max_new_tokens=b, prefix_id=pid))

    if warm:
        without()
        with_cache()
    t0 = time.perf_counter()
    without()
    t_wo = time.perf_counter() - t0
    t0 = time.perf_counter()
    with_cache()
    t_w = time.perf_counter() - t0
    return t_wo, t_w


def _pctl(xs, q):
    return round(float(np.percentile(np.asarray(xs), q)), 4) if len(xs) else None


def run_load_pool(model, variables, prompts, budgets, arrivals, rows,
                  chunk=None, prefix=None, warm=True, fuse=1):
    """Open-loop Poisson load against the continuous pool.

    Requests become visible at their arrival times; the pool is ticked
    continuously. Per request: TTFT = first sampled token's host-visible
    time minus ARRIVAL (queueing included — the number a client sees),
    TPOT = mean inter-token gap after the first. Returns the latency
    record list + makespan."""
    from forde_tpu.models.decode_pool import DecodePool

    def once():
        pool = DecodePool(model, variables, rows=rows, temperature=0.0,
                          prefill_chunk=chunk, decode_fuse=fuse)
        pid = pool.register_prefix(prefix) if prefix is not None else None
        rec = {}
        first = {}
        last = {}
        ntok = {}

        def on_token(rid, tok):
            now = time.perf_counter()
            if rid not in first:
                first[rid] = now
            last[rid] = now
            ntok[rid] = ntok.get(rid, 0) + 1

        t0 = time.perf_counter()
        nxt = 0
        done = 0
        while done < len(prompts):
            now = time.perf_counter() - t0
            while nxt < len(prompts) and arrivals[nxt] <= now:
                rid = pool.submit(
                    prompts[nxt], max_new_tokens=int(budgets[nxt]),
                    prefix_id=pid, on_token=on_token,
                )
                rec[rid] = {"arrival": t0 + arrivals[nxt], "idx": nxt}
                nxt += 1
            if pool.pending():
                done += len(pool.tick())
            elif nxt < len(prompts):
                time.sleep(max(0.0, arrivals[nxt] - (time.perf_counter() - t0)))
        makespan = time.perf_counter() - t0
        out = []
        for rid, r in rec.items():
            tt = first[rid] - r["arrival"]
            n = ntok[rid]
            tpot = (last[rid] - first[rid]) / (n - 1) if n > 1 else 0.0
            out.append({"ttft": tt, "tpot": tpot, "n": n})
        return out, makespan

    if warm:
        once()
    return once()


def run_load_ragged(model, variables, prompts, budgets, arrivals, rows,
                    warm=True):
    """Open-loop load against a dynamic-batching closed-batch server
    (serve_http's pre-pool strategy): collect everything that has arrived,
    run ONE generate_ragged program over up to ``rows`` requests, repeat.
    Tokens only become visible when their batch completes, so TTFT =
    batch completion - arrival."""
    from forde_tpu.models.generate import generate_ragged

    def run_batch(idxs):
        ps = [prompts[i] for i in idxs]
        lens = np.array([len(p) for p in ps], np.int32)
        pmax = int(lens.max())
        new = int(max(budgets[i] for i in idxs))
        padded = np.zeros((len(ps), pmax), np.int32)
        for j, p in enumerate(ps):
            padded[j, : len(p)] = p
        out = generate_ragged(
            model, variables, jnp.asarray(padded), jnp.asarray(lens),
            jax.random.PRNGKey(0), max_new_tokens=new, temperature=0,
        )
        np.asarray(out)  # host sync

    def once():
        t0 = time.perf_counter()
        nxt = 0
        out = []
        while nxt < len(prompts):
            now = time.perf_counter() - t0
            if arrivals[nxt] > now:
                time.sleep(arrivals[nxt] - now)
            avail = [
                i for i in range(nxt, len(prompts))
                if arrivals[i] <= time.perf_counter() - t0
            ]
            batch = avail[:rows]
            run_batch(batch)
            fin = time.perf_counter()
            for i in batch:
                n = int(budgets[i])
                # closed batch: every token of the batch lands at once
                out.append({
                    "ttft": fin - (t0 + arrivals[i]), "tpot": 0.0, "n": n,
                })
            nxt = batch[-1] + 1
        return out, time.perf_counter() - t0

    if warm:
        once()
    return once()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=4)
    ap.add_argument("--num_heads", type=int, default=4)
    ap.add_argument("--num_experts", type=int, default=8)
    ap.add_argument("--max_seq_len", type=int, default=1024)
    ap.add_argument("--min_prompt", type=int, default=16)
    ap.add_argument("--max_prompt", type=int, default=128)
    ap.add_argument("--min_new", type=int, default=16)
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--nsa", action="store_true",
                    help="serve the reference's DEFAULT attention (NSA, "
                         "src/forde/model.py:55) instead of dense-causal; "
                         "prefix/chunked modes are skipped (NSA prefill is "
                         "one teacher-forced forward — no resumable cache)")
    ap.add_argument("--nsa_window", type=int, default=128)
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix_len", type=int, default=256,
                    help="shared system-prompt length for the prefix mode")
    ap.add_argument("--prefill_chunk", type=int, default=None,
                    help="continuous mode: chunked prefill size")
    ap.add_argument("--decode_fuse", type=int, default=0,
                    help="continuous mode: decode k tokens per dispatch "
                         "(0 = off); adds fused variants to the reports")
    ap.add_argument("--skip", default="",
                    help="comma list: sequential,ragged,continuous,prefix,load")
    ap.add_argument("--load_rate", type=float, default=0.0,
                    help="Poisson arrival rate (req/s) for the load mode; "
                         "0 disables it")
    ap.add_argument("--load_prefix", action="store_true",
                    help="load mode: give every request a shared cached "
                         "prefix of --prefix_len")
    ap.add_argument("--no_warm", action="store_true",
                    help="skip the untimed warmup pass (saves time when "
                         "compiles dominate anyway)")
    args = ap.parse_args()

    cfg, model, variables = build(args)
    prompts, budgets = workload(args, cfg)
    tokens = int(budgets.sum())
    print(f"# backend={jax.default_backend()} requests={args.requests} "
          f"prompt_len=[{args.min_prompt},{args.max_prompt}] "
          f"new=[{args.min_new},{args.max_new}] "
          f"output_tokens={tokens} rows={args.rows}", flush=True)
    skip = set(args.skip.split(","))
    if args.nsa:
        # prefix caching / chunked prefill are dense-only contracts
        # (models/decode_pool.py NSA limits) — skip, don't crash.
        skip.add("prefix")
        args.prefill_chunk = None
        args.load_prefix = False
    warm = not args.no_warm

    if "sequential" not in skip:
        dt = run_sequential(model, variables, prompts, budgets, warm)
        print(json.dumps({
            "mode": "sequential", "wall_s": round(dt, 3),
            "out_tok_per_s": round(tokens / dt, 1),
        }), flush=True)
    if "ragged" not in skip:
        dt = run_ragged(model, variables, prompts, budgets, warm)
        padded_tokens = int(budgets.max()) * args.requests
        print(json.dumps({
            "mode": "ragged_batch", "wall_s": round(dt, 3),
            "out_tok_per_s": round(tokens / dt, 1),
            "decoded_incl_padding": padded_tokens,
        }), flush=True)
    if "continuous" not in skip:
        dt, ticks = run_pool(
            model, variables, prompts, budgets, args.rows, warm,
            chunk=args.prefill_chunk,
        )
        print(json.dumps({
            "mode": "continuous_pool", "wall_s": round(dt, 3),
            "out_tok_per_s": round(tokens / dt, 1),
            "ticks": ticks, "prefill_chunk": args.prefill_chunk,
        }), flush=True)
        if args.decode_fuse > 1:
            dt, ticks = run_pool(
                model, variables, prompts, budgets, args.rows, warm,
                chunk=args.prefill_chunk, fuse=args.decode_fuse,
            )
            print(json.dumps({
                "mode": "continuous_pool_fused", "wall_s": round(dt, 3),
                "out_tok_per_s": round(tokens / dt, 1),
                "ticks": ticks, "decode_fuse": args.decode_fuse,
                "prefill_chunk": args.prefill_chunk,
            }), flush=True)
    if "prefix" not in skip:
        plen = min(
            args.prefix_len,
            cfg.max_seq_len - args.max_prompt - args.max_new - 1,
        )
        t_wo, t_w = run_prefix(
            model, variables, prompts, budgets, args.rows, plen, warm,
            args.seed,
        )
        print(json.dumps({
            "mode": "prefix_cached_pool", "prefix_len": plen,
            "wall_s_no_cache": round(t_wo, 3),
            "wall_s_cached": round(t_w, 3),
            "speedup": round(t_wo / t_w, 2),
        }), flush=True)

    # ---- open-loop Poisson load: TTFT/TPOT p50/p99 (vLLM-style SLOs) ----
    if args.load_rate > 0 and "load" not in skip:
        rng = np.random.RandomState(args.seed + 7)
        gaps = rng.exponential(1.0 / args.load_rate, args.requests)
        arrivals = np.cumsum(gaps)
        prefix = None
        if args.load_prefix:
            plen = min(
                args.prefix_len,
                cfg.max_seq_len - args.max_prompt - args.max_new - 1,
            )
            prefix = np.random.RandomState(args.seed + 1).randint(
                1, 1000, (plen,)
            ).tolist()

        def report(name, recs, makespan, tpot_defined=True, **kw):
            ttft = [r["ttft"] for r in recs]
            tpot = [r["tpot"] for r in recs if r["n"] > 1]
            toks = sum(r["n"] for r in recs)
            out = {
                "mode": name, "arrival_rate_rps": args.load_rate,
                "makespan_s": round(makespan, 3),
                "out_tok_per_s": round(toks / makespan, 1),
                "ttft_p50_s": _pctl(ttft, 50), "ttft_p99_s": _pctl(ttft, 99),
                **kw,
            }
            if tpot_defined:
                out["tpot_p50_s"] = _pctl(tpot, 50)
                out["tpot_p99_s"] = _pctl(tpot, 99)
            print(json.dumps(out), flush=True)

        recs, mk = run_load_ragged(
            model, variables, prompts, budgets, arrivals, args.rows, warm
        )
        report("load_ragged_dynamic", recs, mk, tpot_defined=False)
        recs, mk = run_load_pool(
            model, variables, prompts, budgets, arrivals, args.rows,
            chunk=None, prefix=prefix, warm=warm,
        )
        report("load_continuous", recs, mk,
               prefix_len=len(prefix) if prefix else 0)
        if args.decode_fuse > 1:
            recs, mk = run_load_pool(
                model, variables, prompts, budgets, arrivals, args.rows,
                chunk=None, prefix=prefix, warm=warm,
                fuse=args.decode_fuse,
            )
            report("load_continuous_fused", recs, mk,
                   decode_fuse=args.decode_fuse,
                   prefix_len=len(prefix) if prefix else 0)
        if args.prefill_chunk:
            recs, mk = run_load_pool(
                model, variables, prompts, budgets, arrivals, args.rows,
                chunk=args.prefill_chunk, prefix=prefix, warm=warm,
            )
            report("load_continuous_chunked", recs, mk,
                   prefill_chunk=args.prefill_chunk,
                   prefix_len=len(prefix) if prefix else 0)


if __name__ == "__main__":
    main()
