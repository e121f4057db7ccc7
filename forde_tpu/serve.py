"""Inference CLI for the FORDE decoder LM.

The reference repo is training-only (SURVEY.md §0) — this is the serving
surface it never had. Loads an Orbax checkpoint written by
``forde_tpu.train.loop`` (or runs from random init for smoke tests) and
samples continuations with the KV-cache incremental decoder
(``models/generate.generate_cached``): parallel prefill for the prompt,
O(1) attention work per new token, NSA configs included.

Usage:
  python -m forde_tpu.serve --checkpoint_dir runs/ckpt \\
      --prompt "The little GPU that" --max_new_tokens 64 --temperature 0.8
  # or raw token ids, no tokenizer needed (this image has no egress):
  python -m forde_tpu.serve --prompt_ids 12,99,407 --max_new_tokens 16

Checkpoints written by ``train.loop`` carry their model config
(``model_config.json``), so no shape flags are needed; for pre-config
checkpoints (or random-init smoke runs) the shape flags are used with the
same ``config_from_args`` derivation rules as training.
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FORDE decoder LM inference")
    # model shape (must match training; same flags as train.loop)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_experts", type=int, default=8)
    p.add_argument("--top_k_experts", type=int, default=2)
    p.add_argument("--window_size", type=int, default=128)
    p.add_argument("--num_streams", type=int, default=2)
    p.add_argument("--no_moe", action="store_true")
    p.add_argument("--no_nsa", action="store_true")
    p.add_argument("--no_mhc", action="store_true")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--moe_dispatch", choices=["dense", "capacity", "ep"],
                   default="dense")
    # serving
    p.add_argument("--checkpoint_dir", type=str, default=None,
                   help="Orbax dir from train.loop; omit for random init")
    p.add_argument("--prompt", type=str, default=None,
                   help="text prompt (needs the gpt2 tokenizer cache)")
    p.add_argument("--prompt_ids", type=str, default=None,
                   help="comma-separated token ids; bypasses the tokenizer")
    p.add_argument("--prefix_ids", type=str, default=None,
                   help="shared prompt prefix (comma-separated token ids; "
                        "e.g. a system prompt): prefilled ONCE and reused "
                        "by every prompt this invocation decodes — "
                        "outputs contain prompt + continuation only. "
                        "Dense configs; not with --beam_size/"
                        "--draft_checkpoint_dir")
    p.add_argument("--prompts_file", type=str, default=None,
                   help="batch serving: one prompt per line (comma-"
                        "separated token ids, or text with --text_prompts)."
                        " The whole mixed-length batch decodes in ONE "
                        "compiled program (ragged decode, per-row cache "
                        "positions) for every architecture flag, NSA "
                        "included. Results print in input order")
    p.add_argument("--text_prompts", action="store_true",
                   help="treat --prompts_file lines as text (gpt2 "
                        "tokenizer required)")
    p.add_argument("--output_file", type=str, default=None,
                   help="write batch results as JSONL lines "
                        '{"index", "prompt_ids", "output_ids"}')
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=1.0,
                   help="0 = greedy")
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None,
                   help="nucleus sampling: smallest probability mass "
                        ">= top_p (composable with --top_k)")
    p.add_argument("--beam_size", type=int, default=0,
                   help="> 1 switches to beam search (overrides sampling)")
    p.add_argument("--eos_id", type=int, default=None,
                   help="stop a row once it emits this token (the rest "
                        "is --pad_id)")
    p.add_argument("--pad_id", type=int, default=0)
    p.add_argument("--length_penalty", type=float, default=0.0,
                   help="beam search: scores / generated_len**penalty "
                        "(only meaningful with --eos_id)")
    p.add_argument("--tensor_parallelism", type=int, default=1,
                   help="shard the model over N chips for serving "
                        "(Megatron GSPMD layout, core/mesh.tp_param_spec); "
                        "decode is token-exact vs single device. For "
                        "throughput serving, batch prompts and shard "
                        "over 'data' via the library (tests/test_generate)")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the EMA weights (requires a checkpoint "
                        "trained with --ema_decay)")
    p.add_argument("--lora_base_dir", type=str, default=None,
                   help="LoRA checkpoints record their frozen base's "
                        "path; override it here if the base moved "
                        "(adapters are merged into the weights at load "
                        "— zero serving overhead)")
    p.add_argument("--draft_checkpoint_dir", type=str, default=None,
                   help="enable speculative decoding: a (smaller) draft "
                        "model checkpoint with model_config.json; both "
                        "models must be dense-causal (--no_nsa) and share "
                        "the vocab (models/speculative.py)")
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative decoding: draft proposals per round")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="weight-only int8 serving: attention/FFN/lm_head "
                        "kernels AND the stacked MoE expert bank "
                        "quantized per-channel at load, matmuls run int8 "
                        "on the MXU; NSA branch projections stay fp "
                        "(ops/quant.py)")
    p.add_argument("--seed", type=int, default=0)
    return p


def _tokenizer():
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained("gpt2")
    except Exception as e:  # no egress / no cache
        print(f"[serve] gpt2 tokenizer unavailable ({e}); "
              "use --prompt_ids", file=sys.stderr)
        return None


def load_serving_model(args):
    """Args -> (config, model, variables): checkpoint (or random-init)
    restore, EMA swap, int8 quantization, and tensor-parallel sharding —
    the model-loading recipe shared by this CLI and the HTTP serving
    daemon (forde_tpu.serve_http)."""
    # reuse the training CLI's config derivation so shapes always line up
    from forde_tpu.models.decoder_lm import FORDEDecoderLM
    from forde_tpu.train.loop import config_from_args
    from forde_tpu.train.state import create_train_state

    config = state = None
    if args.checkpoint_dir:
        from forde_tpu.train.checkpoint import load_lm_state, load_model_config

        if load_model_config(args.checkpoint_dir) is not None:
            # the ONE restore recipe (train/checkpoint.load_lm_state):
            # rebuild the saved tree structure (moment dtype, warmup
            # schedule, EMA) from the train meta, then restore into it
            config, state = load_lm_state(
                args.checkpoint_dir, init_seq_len=args.seq_len,
                lora_base_dir=args.lora_base_dir,
            )
            print(f"[serve] model config loaded from "
                  f"{args.checkpoint_dir}/model_config.json")
            from forde_tpu.train.checkpoint import load_train_meta

            if load_train_meta(args.checkpoint_dir).get("lora"):
                print("[serve] LoRA checkpoint: adapters merged into the "
                      "base weights at load")
            print(f"[serve] restored step {int(state.step)} "
                  f"from {args.checkpoint_dir}")
    if config is None:
        # pre-config checkpoint or random-init smoke: shapes from flags
        # (config_from_args reads these training-only fields too)
        args.remat = False
        args.scan_layers = False
        config = config_from_args(args).replace(dropout_rate=0.0)
        state = create_train_state(
            config, jax.random.PRNGKey(args.seed),
            learning_rate=1e-4, weight_decay=0.0,
            init_batch_shape=(1, min(args.seq_len, config.max_seq_len)),
        )
        if args.checkpoint_dir:
            from forde_tpu.train.checkpoint import restore_checkpoint

            state = restore_checkpoint(args.checkpoint_dir, state)
            print(f"[serve] restored step {int(state.step)} "
                  f"from {args.checkpoint_dir}")
        else:
            print("[serve] no --checkpoint_dir: random init (smoke mode)")
    if args.use_ema:
        from forde_tpu.train.ema import swap_in_ema

        state = swap_in_ema(state)
        print("[serve] serving EMA weights")

    if args.quantize:
        from forde_tpu.ops.quant import quantize_params

        config = config.replace(quantized=True)
        state = state.replace(params=quantize_params(state.params))
        print("[serve] int8 weight-only quantization applied "
              "(attention/FFN/lm_head kernels + MoE expert bank; NSA "
              "branch projections stay fp)")
    model = FORDEDecoderLM(config=config)
    variables = {"params": state.params, "stats_buffer": state.stats_buffer}
    if args.tensor_parallelism > 1:
        # Model-parallel serving: params Megatron-sharded over 'model';
        # GSPMD partitions the whole cached-decode program (token-exact
        # — tests/test_generate.py).
        from forde_tpu.core import mesh as mesh_lib
        from forde_tpu.train.state import _leaf_sharding

        mesh = mesh_lib.create_mesh(
            data=1, model=args.tensor_parallelism,
            devices=jax.devices()[: args.tensor_parallelism],
        )
        variables = jax.tree_util.tree_map_with_path(
            lambda p, leaf: jax.device_put(
                leaf, _leaf_sharding(p, leaf, mesh)
            ),
            variables,
        )
        print(f"[serve] mesh serving: {dict(mesh.shape)}")
    return config, model, variables


def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    from forde_tpu.models.generate import generate_cached

    config, model, variables = load_serving_model(args)

    prefix_cache, prefix_len = None, 0
    if args.prefix_ids:
        from forde_tpu.models.generate import prefill_prefix

        if config.use_sparse_attention:
            sys.exit("--prefix_ids requires a dense-causal config (NSA "
                     "streaming caches depend on what follows the prefix)")
        if args.beam_size > 1 or args.draft_checkpoint_dir:
            sys.exit("--prefix_ids composes with greedy/sampled cached "
                     "decode only")
        prefix = [int(t) for t in args.prefix_ids.split(",")]
        prefix_len = len(prefix)
        prefix_cache = prefill_prefix(
            model, variables, jnp.asarray([prefix], jnp.int32)
        )
        print(f"[serve] shared prefix prefilled once ({prefix_len} tokens); "
              "outputs hold prompt + continuation only")

    tok = None
    ids = None
    if args.prompts_file:
        pass  # batch mode: prompts are read below
    elif args.prompt_ids:
        ids = np.array(
            [[int(t) for t in args.prompt_ids.split(",")]], np.int32
        )
    elif args.prompt is not None:
        tok = _tokenizer()
        if tok is None:
            sys.exit(2)
        ids = np.array([tok.encode(args.prompt)], np.int32)
    else:
        ids = np.array([[0]], np.int32)
        print("[serve] no prompt given; starting from token 0")
    if ids is not None:
        assert (
            prefix_len + ids.shape[1] + args.max_new_tokens
            <= config.max_seq_len
        ), (
            "prefix + prompt + max_new_tokens exceeds max_seq_len "
            f"({prefix_len} + {ids.shape[1]} + {args.max_new_tokens} > "
            f"{config.max_seq_len})"
        )

    if args.prompts_file:
        # Throughput serving: the whole mixed-length batch decodes RAGGED
        # in one program (right-padded prompts, per-row cache positions —
        # models/generate.generate_ragged) for EVERY architecture flag;
        # NSA rows prefill through the length-aware nsa_prefill.
        if args.beam_size > 1 or args.draft_checkpoint_dir:
            sys.exit("--prompts_file composes with greedy/sampled cached "
                     "decode only (not --beam_size/--draft_checkpoint_dir)")
        import json

        with open(args.prompts_file) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        if args.text_prompts:
            tok = _tokenizer()
            if tok is None:
                sys.exit(2)
            prompts = [tok.encode(ln) for ln in lines]
        else:
            prompts = [[int(t) for t in ln.split(",")] for ln in lines]
        for i, pr in enumerate(prompts):
            assert (
                prefix_len + len(pr) + args.max_new_tokens
                <= config.max_seq_len
            ), (
                f"prompt {i}: {prefix_len} (prefix) + {len(pr)} + "
                f"{args.max_new_tokens} tokens exceeds max_seq_len "
                f"{config.max_seq_len}"
            )
        results = [None] * len(prompts)
        key = jax.random.PRNGKey(args.seed)
        from forde_tpu.models.generate import generate_ragged

        lens = np.array([len(pr) for pr in prompts], np.int32)
        pmax = int(lens.max())
        padded = np.full((len(prompts), pmax), args.pad_id, np.int32)
        for i, pr in enumerate(prompts):
            padded[i, : len(pr)] = pr
        out = np.asarray(generate_ragged(
            model, variables, jnp.asarray(padded), jnp.asarray(lens),
            key, max_new_tokens=args.max_new_tokens,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, eos_id=args.eos_id, pad_id=args.pad_id,
            prefix_cache=prefix_cache,
        ))
        for i, ln in enumerate(lens):
            results[i] = out[i, : int(ln) + args.max_new_tokens].tolist()
        mode = "ragged (1 program)"
        for i, row in enumerate(results):
            print(f"[{i}] token ids: {row}")
        if args.output_file:
            with open(args.output_file, "w") as f:
                for i, row in enumerate(results):
                    f.write(json.dumps({
                        "index": i,
                        "prompt_ids": prompts[i],
                        "output_ids": row,
                    }) + "\n")
            print(f"[serve] wrote {len(results)} results to "
                  f"{args.output_file}")
        print(f"[serve] batch: {len(prompts)} prompts, {mode}")
        return
    if args.draft_checkpoint_dir:
        from forde_tpu.models.decoder_lm import FORDEDecoderLM
        from forde_tpu.models.speculative import generate_speculative
        from forde_tpu.train.checkpoint import load_lm_state

        dcfg, dstate = load_lm_state(
            args.draft_checkpoint_dir, init_seq_len=args.seq_len
        )
        print(f"[serve] speculative decoding: draft restored step "
              f"{int(dstate.step)} (gamma={args.gamma})")
        dparams = dstate.params
        if args.quantize:
            from forde_tpu.ops.quant import quantize_params as _qp

            dcfg = dcfg.replace(quantized=True)
            dparams = _qp(dparams)
            print("[serve] draft quantized int8 too")
        draft_model = FORDEDecoderLM(config=dcfg)
        dvars = {
            "params": dparams, "stats_buffer": dstate.stats_buffer,
        }
        out, stats = generate_speculative(
            model, variables, draft_model, dvars, jnp.asarray(ids),
            jax.random.PRNGKey(args.seed),
            max_new_tokens=args.max_new_tokens, gamma=args.gamma,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p, eos_id=args.eos_id, pad_id=args.pad_id,
            with_stats=True,
        )
        r, g = int(stats["rounds"]), int(stats["generated"])
        print(f"[serve] speculative: {g} tokens in {r} target forwards "
              f"({g / max(r, 1):.2f} tokens/forward)")
    elif args.beam_size > 1:
        from forde_tpu.models.generate import generate_beam

        out = generate_beam(
            model, variables, jnp.asarray(ids),
            max_new_tokens=args.max_new_tokens, beam_size=args.beam_size,
            length_penalty=args.length_penalty,
            eos_id=args.eos_id, pad_id=args.pad_id,
        )
    else:
        out = generate_cached(
            model, variables, jnp.asarray(ids), jax.random.PRNGKey(args.seed),
            max_new_tokens=args.max_new_tokens, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p,
            eos_id=args.eos_id, pad_id=args.pad_id,
            prefix_cache=prefix_cache,
        )
    out = np.asarray(out)[0]
    print("token ids:", out.tolist())
    if tok is None and args.prompt is None and args.prompt_ids is None:
        return
    if tok is None and args.prompt_ids:
        tok = _tokenizer()
    if tok is not None:
        print("text:", tok.decode(out))


if __name__ == "__main__":
    main()
