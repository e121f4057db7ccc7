"""Training driver + CLI for the FORDE decoder LM.

Parity target: reference src/training/train.py:174-429 — same flag surface
(--no_moe/--no_nsa/--no_mhc/--use_dummy_data/--slow_loop_interval/
--checkpoint_dir/--experiment_name/...), same derived config rules
(vocab 50257, expert_hidden_dim = 4*d_model, head_dim = d_model//num_heads,
train.py:240-259), same TensorBoard tags, slow loop every N steps swapping
params and resetting the stats buffer (train.py:364-403).

Beyond the reference: device prefetch instead of per-step blocking copies,
an on-device (jitted) slow loop, throughput metering, brain-map artifacts
actually wired in (plot helpers are dead code in the reference,
SURVEY.md §2 row 16), periodic Orbax checkpointing WITH resume, and mesh
placement for multi-chip runs.
"""

from __future__ import annotations

import argparse
import time
from datetime import datetime
from typing import Optional

import jax
import numpy as np

from forde_tpu.brain.slow_loop import moe_slow_loop_step
from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import BrainConfig, DTypePolicy, LLMConfig
from forde_tpu.data.lm import (
    create_dummy_dataset,
    create_lm_dataset,
    create_markov_dataset,
)
from forde_tpu.data.prefetch import prefetch_to_device
from forde_tpu.obs.metrics import (
    REFERENCE_TAGS,
    MetricsWriter,
    ThroughputMeter,
)
from forde_tpu.obs.plots import plot_brain_scan, plot_census, plot_feature_space
from forde_tpu.train import checkpoint as ckpt_lib
from forde_tpu.train.state import create_train_state, shard_train_state
from forde_tpu.train.step import train_step


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the FORDE decoder LM on TPU")
    # training args (reference train.py:178-192)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup steps (0 = constant LR)")
    p.add_argument("--lr_schedule", choices=["constant", "cosine"],
                   default="constant",
                   help="post-warmup LR: constant, or cosine decay to "
                        "min_lr_ratio*peak over --decay_steps")
    p.add_argument("--decay_steps", type=int, default=0,
                   help="cosine decay horizon (after warmup); 0 = derive "
                        "from steps_per_epoch*num_epochs - warmup")
    p.add_argument("--min_lr_ratio", type=float, default=0.0,
                   help="cosine floor as a fraction of the peak LR")
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--aux_loss_weight", type=float, default=0.01,
                   help="MoE aux loss weight (reference train.py default)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "step (must divide --batch_size); peak activation "
                        "memory is one microbatch's")
    # model args (reference train.py:195-207)
    p.add_argument("--d_model", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_experts", type=int, default=8)
    p.add_argument("--top_k_experts", type=int, default=2)
    p.add_argument("--window_size", type=int, default=128)
    p.add_argument("--num_streams", type=int, default=2)
    # feature flags (reference train.py:209-237)
    p.add_argument("--no_moe", action="store_true")
    p.add_argument("--no_nsa", action="store_true")
    p.add_argument("--no_mhc", action="store_true")
    p.add_argument("--use_dummy_data", action="store_true")
    p.add_argument("--data_file", type=str, default=None,
                   help="train on a LOCAL corpus: .npy token ids or raw "
                        "text (byte-level ids 0..255 — no tokenizer/"
                        "egress needed; --tokenizer gpt2 to tokenize "
                        "instead); packed seq_len windows, reshuffled "
                        "per epoch (data/lm.py TextFileDataset)")
    p.add_argument("--tokenizer", choices=["byte", "gpt2"], default="byte",
                   help="tokenization for a text --data_file")
    p.add_argument("--use_markov_data", action="store_true",
                   help="structured synthetic data with a known entropy "
                        "floor (learnable offline; see data/lm.py)")
    p.add_argument("--markov_active_vocab", type=int, default=8192)
    p.add_argument("--markov_p", type=float, default=0.85)
    p.add_argument("--slow_loop_interval", type=int, default=100,
                   help="0 disables the brain update")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--checkpoint_interval", type=int, default=0,
                   help="steps between checkpoints; 0 = final only")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in --checkpoint_dir")
    p.add_argument("--experiment_name", type=str, default="forde_tpu_llm")
    # TPU-first knobs
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--moe_dispatch", choices=["dense", "capacity", "ep"],
                   default="dense",
                   help='"ep" = explicit shard_map expert parallelism '
                        "(requires --expert_parallelism > 1)")
    p.add_argument("--moment_dtype", type=str, default=None,
                   help="Adam moment storage dtype (e.g. bfloat16) — halves "
                        "optimizer HBM traffic; update math stays fp32")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0 keeps an exponential moving average of the "
                        "params (updated inside the jitted step, "
                        "checkpointed; serve --use_ema loads it)")
    p.add_argument("--distill_from", type=str, default=None,
                   help="teacher checkpoint dir (with model_config.json): "
                        "adds a KL term against the frozen teacher's "
                        "logits (train/distill.py) — e.g. train a small "
                        "draft for speculative serving")
    p.add_argument("--distill_alpha", type=float, default=0.5,
                   help="weight of the hard-label CE term (1-alpha on KL)")
    p.add_argument("--distill_temperature", type=float, default=2.0)
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start params from a checkpoint dir (with "
                        "model_config.json). The ARCHITECTURE comes from "
                        "that config (CLI shape flags are ignored; only "
                        "--remat is taken from the CLI). Fresh optimizer, "
                        "step 0 — plain fine-tuning unless --lora_rank "
                        "makes it parameter-efficient")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="> 0 freezes the base (--init_from required) and "
                        "trains rank-r LoRA adapters over --lora_targets "
                        "only; checkpoints save the adapters + a base "
                        "pointer and serving merges them into the weights "
                        "(train/lora.py)")
    p.add_argument("--lora_alpha", type=float, default=16.0,
                   help="LoRA scale = alpha / rank")
    p.add_argument("--lora_targets", type=str, default=None,
                   help="comma-separated module/param names to adapt "
                        "(default: attention projections qkv_proj,"
                        "out_proj,q_proj,k_proj,v_proj; add w_up,w_down "
                        "for the MoE expert banks)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over layers (fast compiles; see PERF.md)")
    p.add_argument("--expert_parallelism", type=int, default=1,
                   help="size of the expert mesh axis")
    p.add_argument("--context_parallelism", type=int, default=1,
                   help="size of the context mesh axis; >1 shards the "
                        "sequence dim — dense attention rides ring/zigzag "
                        "attention, NSA uses window halo exchange "
                        "(parallel/nsa_context.py)")
    p.add_argument("--param_sharding", choices=["replicated", "fsdp"],
                   default="replicated",
                   help="fsdp = ZeRO-3-style: params + optimizer moments "
                        "sharded over the data axis (largest free dim); "
                        "XLA all-gathers weights per use and "
                        "reduce-scatters grads — per-device state memory "
                        "drops ~data-fold")
    p.add_argument("--pipeline_parallelism", type=int, default=1,
                   help="size of the pipe mesh axis; >1 runs the layer "
                        "stack as a GPipe schedule over stages (requires "
                        "--scan_layers; parallel/pipeline.py)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches (default 2x stages); must "
                        "divide batch_size")
    p.add_argument("--tensor_parallelism", type=int, default=1,
                   help="size of the model mesh axis; >1 column/row-"
                        "shards attention + expert projections "
                        "(Megatron layout, core/mesh.tp_param_spec) — "
                        "XLA inserts the all-reduces from the GSPMD "
                        "annotations")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--plots_dir", type=str, default="plots")
    p.add_argument("--seed", type=int, default=42)
    return p


def config_from_args(args) -> LLMConfig:
    """Derived-config rules match reference train.py:240-259."""
    return LLMConfig(
        vocab_size=50257,
        d_model=args.d_model,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        head_dim=args.d_model // args.num_heads,
        max_seq_len=max(args.seq_len, 1024),
        use_moe=not args.no_moe,
        num_experts=args.num_experts,
        top_k_experts=args.top_k_experts,
        expert_hidden_dim=4 * args.d_model,
        use_sparse_attention=not args.no_nsa,
        window_size=args.window_size,
        use_hyper_connections=not args.no_mhc,
        num_streams=args.num_streams,
        moe_dispatch=args.moe_dispatch,
        remat=args.remat,
        scan_layers=args.scan_layers,
        dropout_rate=0.0,
        dtypes=DTypePolicy.bf16() if args.bf16 else DTypePolicy.fp32(),
    )


def train(args: Optional[argparse.Namespace] = None) -> dict:
    if args is None:
        args = build_parser().parse_args([])
    config = config_from_args(args)
    brain = BrainConfig()

    if args.init_from:
        base_config = ckpt_lib.load_model_config(args.init_from)
        if base_config is None:
            raise ValueError(
                f"--init_from {args.init_from} has no model_config.json"
            )
        # the checkpointed tree layout (incl. scan_layers) is the
        # architecture; remat is the one compile-side knob kept from CLI
        config = base_config.replace(dropout_rate=0.0, remat=args.remat)
        print(f"config loaded from {args.init_from}/model_config.json "
              f"(CLI shape flags ignored; scan_layers={config.scan_layers})")
        if args.seq_len > config.max_seq_len:
            raise ValueError(
                f"--seq_len {args.seq_len} exceeds the base model's "
                f"max_seq_len {config.max_seq_len}"
            )
    if args.lora_rank:
        if not args.init_from:
            raise ValueError("--lora_rank requires --init_from (LoRA "
                             "fine-tunes a frozen base checkpoint)")
        incompatible = [
            (args.distill_from, "--distill_from"),
            (args.grad_accum > 1, "--grad_accum"),
            (args.pipeline_parallelism > 1, "--pipeline_parallelism"),
            (args.moe_dispatch == "ep", "--moe_dispatch ep"),
            (args.context_parallelism > 1, "--context_parallelism"),
            (args.tensor_parallelism > 1, "--tensor_parallelism"),
            (args.param_sharding != "replicated", "--param_sharding fsdp"),
        ]
        for cond, name in incompatible:
            if cond:
                raise ValueError(f"--lora_rank does not compose with {name} "
                                 "yet (data parallelism composes)")
        if args.slow_loop_interval > 0 and config.use_moe:
            raise ValueError(
                "--lora_rank needs --slow_loop_interval 0: the brain "
                "update actuates router biases in the FROZEN base, which "
                "would drift it away from the checkpoint the serving "
                "merge reloads"
            )

    if args.context_parallelism > 1 and not args.no_nsa:
        # NSA under CP needs the window to fit within one shard boundary
        # (halo exchange, parallel/nsa_context.py) and ratio-aligned shards.
        per_shard = args.seq_len // args.context_parallelism
        if per_shard < args.window_size - 1:
            raise ValueError(
                f"--context_parallelism {args.context_parallelism} puts "
                f"{per_shard} tokens per shard < window_size-1 "
                f"({args.window_size - 1}); use fewer context shards"
            )
    if args.context_parallelism > 1 and args.seq_len % args.context_parallelism:
        raise ValueError(
            f"--seq_len {args.seq_len} must divide by "
            f"--context_parallelism {args.context_parallelism}"
        )
    if args.moe_dispatch == "ep" and args.expert_parallelism <= 1:
        raise ValueError('--moe_dispatch ep requires --expert_parallelism > 1')
    pp = args.pipeline_parallelism
    if pp > 1:
        if not args.scan_layers:
            raise ValueError("--pipeline_parallelism requires --scan_layers "
                             "(the stacked layout IS the stage slicing)")
        if args.num_layers % pp:
            raise ValueError(f"--pipeline_parallelism {pp} must divide "
                             f"--num_layers {args.num_layers}")
        mb = args.pp_microbatches or 2 * pp
        if args.batch_size % mb:
            raise ValueError(f"pp microbatches {mb} must divide "
                             f"--batch_size {args.batch_size}")
        # The pipeline composes with DP only (microbatch examples shard
        # over 'data'); the stage program runs each block un-meshed, so
        # shard_map EP, ring/NSA CP, and Megatron TP inside a stage are
        # follow-ups — fail loudly instead of silently replicating.
        if args.moe_dispatch == "ep":
            raise ValueError("--pipeline_parallelism does not compose with "
                             "--moe_dispatch ep yet (stages run un-meshed); "
                             "use dense/capacity dispatch")
        if args.context_parallelism > 1 or args.tensor_parallelism > 1:
            raise ValueError("--pipeline_parallelism composes with data "
                             "parallelism only for now — set "
                             "--context_parallelism/--tensor_parallelism "
                             "to 1")
        if args.distill_from:
            raise ValueError("--distill_from does not compose with "
                             "--pipeline_parallelism yet (the GPipe step "
                             "has no teacher-forward slot)")
        mesh_batch = args.batch_size // mb  # data axis must divide ONE
        # microbatch (pipeline.py shards microbatch examples over data)
    else:
        mesh_batch = args.batch_size
    if args.grad_accum > 1:
        if pp > 1:
            raise ValueError("--grad_accum does not compose with "
                             "--pipeline_parallelism (GPipe already "
                             "microbatches); use --pp_microbatches")
        if args.batch_size % args.grad_accum:
            raise ValueError(f"--grad_accum {args.grad_accum} must divide "
                             f"--batch_size {args.batch_size}")
        # the data axis shards ONE microbatch at a time
        mesh_batch = args.batch_size // args.grad_accum

    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.create_mesh_for_batch(
        mesh_batch, expert=args.expert_parallelism,
        context=args.context_parallelism, model=args.tensor_parallelism,
        pipe=pp,
    )
    print(f"mesh: {dict(mesh.shape)} over {jax.device_count()} devices")
    # The mesh becomes part of the model only for the explicit-parallel
    # paths; the pure-pjit paths keep a mesh-free apply_fn.
    model_mesh = (
        mesh
        if (args.moe_dispatch == "ep" or args.context_parallelism > 1)
        else None
    )

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    if args.lr_schedule == "cosine" and args.decay_steps == 0:
        args.decay_steps = max(
            args.steps_per_epoch * args.num_epochs - args.warmup_steps, 1
        )
        print(f"cosine decay over {args.decay_steps} steps "
              f"(derived from the run length)")
    state = create_train_state(
        config,
        init_rng,
        args.learning_rate,
        args.weight_decay,
        init_batch_shape=(1, min(64, args.seq_len)),
        mesh=model_mesh,
        warmup_steps=args.warmup_steps,
        moment_dtype=args.moment_dtype,
        lr_schedule=args.lr_schedule,
        decay_steps=args.decay_steps,
        min_lr_ratio=args.min_lr_ratio,
    )
    base_params = None
    if args.init_from:
        _, base_params, _ = ckpt_lib.load_lm_params(
            args.init_from, init_seq_len=min(64, args.seq_len)
        )
        if args.lora_rank:
            from forde_tpu.train import lora as lora_lib

            rng, lora_rng = jax.random.split(rng)
            state = lora_lib.create_lora_train_state(
                state, base_params, args.lora_rank, lora_rng, state.tx,
                targets=lora_lib.parse_targets(args.lora_targets),
            )
            n_adapt = lora_lib.adapter_param_count(state.params)
            n_base = sum(
                x.size for x in jax.tree_util.tree_leaves(base_params)
            )
            print(f"LoRA rank {args.lora_rank}: {n_adapt:,} trainable "
                  f"adapter params over a frozen {n_base:,}-param base "
                  f"({100 * n_adapt / n_base:.2f}%)")
        else:
            state = state.replace(params=base_params)
            print(f"warm-started params from {args.init_from} "
                  "(fresh optimizer, step 0)")
    if args.ema_decay > 0:
        from forde_tpu.train.ema import init_ema

        # before sharding/restore: the EMA tree is part of the state's
        # structure (checkpoints and shardings must see it)
        state = init_ema(state)
    state = shard_train_state(state, mesh, param_sharding=args.param_sharding)
    if args.lora_rank and base_params is not None:
        # the frozen base rides along as a jit argument — replicate it
        # onto the mesh once so DP steps never re-transfer it
        base_params = jax.device_put(base_params, mesh_lib.replicated(mesh))

    manager = None
    if args.checkpoint_dir:
        # everything that shapes the SAVED STATE's tree structure
        # (serve.py must rebuild an identical one to restore):
        # bf16 moments change leaf dtypes, warmup swaps the LR
        # scale for a stateful schedule (ScaleByScheduleState).
        train_meta = {
            "moment_dtype": args.moment_dtype,
            "warmup_steps": args.warmup_steps,
            "ema_decay": args.ema_decay,
            # non-constant schedules make the LR scale stateful
            # (ScaleByScheduleState) — restore must rebuild the same tree
            "lr_schedule": args.lr_schedule,
            "decay_steps": args.decay_steps,
            "min_lr_ratio": args.min_lr_ratio,
        }
        if args.lora_rank:
            import os

            from forde_tpu.train.lora import parse_targets

            # the saved params ARE the adapters; serving rebuilds the
            # adapter tree from this meta, restores, and merges into the
            # base recorded here (checkpoint.load_lm_state)
            train_meta["lora"] = {
                "rank": args.lora_rank,
                "alpha": args.lora_alpha,
                "targets": list(parse_targets(args.lora_targets)),
                "base": os.path.abspath(args.init_from),
            }
        manager = ckpt_lib.CheckpointManager(args.checkpoint_dir, keep=2)
        ckpt_lib.save_model_config(
            args.checkpoint_dir, config, train_meta=train_meta,
        )
        if args.resume and manager.latest_step() is not None:
            state = manager.restore(state)
            print(f"resumed from step {int(state.step)}")

    run_name = f"{args.experiment_name}_{datetime.now():%Y%m%d_%H%M%S}"
    writer = MetricsWriter(f"runs/{run_name}")

    if args.data_file:
        from forde_tpu.data.lm import create_text_file_dataset

        dataset = create_text_file_dataset(
            args.data_file, args.batch_size, args.seq_len,
            num_batches=args.steps_per_epoch * args.num_epochs,
            tokenizer=args.tokenizer, seed=args.seed,
        )
        if dataset.vocab_hint > config.vocab_size:
            raise ValueError(
                f"{args.data_file} has ids up to {dataset.vocab_hint - 1} "
                f">= model vocab {config.vocab_size}"
            )
        print(f"local corpus {args.data_file}: {len(dataset.windows):,} "
              f"windows of {args.seq_len} tokens "
              f"({args.tokenizer} tokenization)")
    elif args.use_markov_data:
        dataset = create_markov_dataset(
            args.batch_size, args.seq_len, config.vocab_size,
            num_batches=args.steps_per_epoch * args.num_epochs,
            active_vocab=args.markov_active_vocab, p=args.markov_p,
            seed=args.seed,
        )
        print(
            f"markov data: active_vocab {dataset.active_vocab} p {dataset.p} "
            f"unigram floor {np.log(dataset.active_vocab):.3f} nats, "
            f"perfect-model floor {dataset.entropy_floor():.3f} nats"
        )
    elif args.use_dummy_data:
        dataset = create_dummy_dataset(
            args.batch_size, args.seq_len, config.vocab_size,
            num_batches=args.steps_per_epoch * args.num_epochs,
        )
    else:
        dataset = create_lm_dataset(
            args.batch_size, args.seq_len,
            num_batches=args.steps_per_epoch * args.num_epochs,
        )

    if pp > 1:
        from forde_tpu.parallel.pipeline import make_pp_train_step

        pp_step = make_pp_train_step(
            config, mesh, args.pp_microbatches or 2 * pp,
            aux_loss_weight=args.aux_loss_weight,
        )
        step_fn = pp_step
    elif args.lora_rank:
        from forde_tpu.train.lora import lora_scale, make_lora_train_step

        lora_step = make_lora_train_step(
            lora_scale(args.lora_rank, args.lora_alpha),
            aux_loss_weight=args.aux_loss_weight,
        )
        frozen_base = base_params

        def step_fn(state, batch):
            return lora_step(state, frozen_base, batch)
    elif args.distill_from:
        if args.grad_accum > 1:
            raise ValueError("--distill_from does not compose with "
                             "--grad_accum yet")
        from forde_tpu.train.distill import load_teacher, make_distill_step

        teacher_model, teacher_vars = load_teacher(args.distill_from)
        if teacher_model.config.vocab_size != config.vocab_size:
            raise ValueError("teacher/student vocab mismatch")
        print(f"distilling from {args.distill_from} "
              f"(alpha={args.distill_alpha}, T={args.distill_temperature})")
        step_fn = make_distill_step(
            teacher_model, teacher_vars,
            aux_loss_weight=args.aux_loss_weight,
            alpha=args.distill_alpha,
            temperature=args.distill_temperature,
        )
    elif args.grad_accum > 1:
        from forde_tpu.train.step import make_accum_train_step

        step_fn = make_accum_train_step(
            args.grad_accum, aux_loss_weight=args.aux_loss_weight
        )
    else:
        def step_fn(state, batch):
            return train_step(
                state, batch, aux_loss_weight=args.aux_loss_weight
            )
    if args.ema_decay > 0:
        from forde_tpu.train.ema import with_ema

        step_fn = with_ema(step_fn, args.ema_decay)

    meter = ThroughputMeter(items_per_step=args.batch_size * args.seq_len)
    batch_sharding = mesh_lib.tokens_sharding(mesh)
    global_step = int(state.step)
    last_metrics = {}

    # Graceful preemption: SIGTERM/SIGINT request a clean stop — the loop
    # breaks at the next step boundary and the normal final force-save
    # runs, so a preempted run resumes with --resume instead of losing
    # everything since the last interval checkpoint.
    import signal

    stop_requested = []
    prev_handlers = {}
    if manager is not None:
        def _request_stop(signum, frame):
            if not stop_requested:
                print(f"signal {signum}: finishing step, saving checkpoint, "
                      "exiting")
            stop_requested.append(signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread (e.g. under a test runner)
                pass

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    try:
        for epoch in range(args.num_epochs):
            if stop_requested:
                break
            batches = prefetch_to_device(iter(dataset), sharding=batch_sharding)
            for batch in batches:
                if stop_requested:
                    break
                state, metrics = step_fn(state, batch)
                global_step += 1
                meter.step()

                if global_step % args.log_interval == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    last_metrics = host
                    if not np.isfinite(host["loss/total"]):
                        # The reference silently logged NaN for a whole run
                        # (SURVEY.md §6); fail loudly instead.
                        raise FloatingPointError(
                            f"non-finite loss at step {global_step}: {host}"
                        )
                    writer.scalars(
                        {REFERENCE_TAGS.get(k, k): v for k, v in host.items()},
                        global_step,
                    )
                    writer.scalar(
                        "Throughput/tokens_per_sec_per_chip",
                        meter.items_per_sec_per_chip,
                        global_step,
                    )
                    print(
                        f"epoch {epoch} step {global_step}: "
                        f"loss {host['loss/total']:.4f} "
                        f"(lm {host['loss/lm']:.4f} aux {host['loss/aux']:.4f}) "
                        f"grad_norm {host['training/grad_norm']:.2f} "
                        f"{meter.items_per_sec_per_chip:,.0f} tok/s/chip"
                    )

                if (
                    config.use_moe
                    and args.slow_loop_interval > 0
                    and global_step % args.slow_loop_interval == 0
                ):
                    rng, slow_key = jax.random.split(rng)
                    # Drain queued async fast-loop work BEFORE the timer so
                    # the metric measures the brain update, not the backlog
                    # of dispatched train steps. (block_until_ready does not
                    # synchronize through the axon tunnel; a host transfer
                    # of a value produced by the last step does.)
                    jax.device_get(metrics["loss/total"])
                    t0 = time.perf_counter()
                    new_params, new_mutable, diag = moe_slow_loop_step(
                        state.params,
                        {"stats_buffer": state.stats_buffer},
                        config,
                        slow_key,
                        epoch=epoch,
                        step=global_step,
                        brain=brain,
                        verbose=True,
                    )
                    state = state.replace(
                        params=new_params,
                        stats_buffer=new_mutable["stats_buffer"],
                    )
                    # One bulk transfer of the (small) diagnostics dict;
                    # everything below reads host values.
                    diag = jax.device_get(diag)
                    dt_ms = (time.perf_counter() - t0) * 1000
                    writer.scalar("SlowLoop/latency_ms", dt_ms, global_step)
                    writer.scalar(
                        "SlowLoop/load_imbalance",
                        float(diag["load_imbalance"]),
                        global_step,
                    )
                    writer.scalar(
                        "SlowLoop/routing_entropy",
                        float(diag["routing_entropy"]),
                        global_step,
                    )
                    if args.plots_dir and not bool(diag["skipped"]):
                        assignments = np.asarray(diag["assignments"])
                        gh = int(np.sqrt(assignments.size)) or 1
                        while assignments.size % gh:
                            gh -= 1
                        plot_brain_scan(
                            assignments.reshape(gh, -1), epoch, global_step,
                            args.plots_dir,
                        )
                        plot_feature_space(
                            np.asarray(diag["cluster_features"]),
                            assignments, epoch, global_step, args.plots_dir,
                            feature_names=("usage mean", "usage var"),
                        )
                        plot_census(
                            assignments, epoch, global_step, args.plots_dir,
                            num_clusters=brain.num_clusters,
                            labels={0: "Generalist", 1: "Specialist",
                                    2: "Under-utilized"},
                        )

                if (
                    manager is not None
                    and args.checkpoint_interval > 0
                    and global_step % args.checkpoint_interval == 0
                ):
                    manager.save(global_step, state)

                if global_step >= args.steps_per_epoch * (epoch + 1):
                    break
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)

    if manager is not None:
        manager.save(global_step, state, force=True)
        manager.wait()
        manager.close()
    writer.close()
    return {"state": state, "final_metrics": last_metrics, "step": global_step}


def main():
    args = build_parser().parse_args()
    train(args)


if __name__ == "__main__":
    main()
