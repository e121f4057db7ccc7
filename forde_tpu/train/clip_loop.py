"""Dual-encoder (CLIP) training driver + CLI.

Covers the reference's vision-language capability set end to end
(README.md:22-66 + BASELINE.json configs): streamed Conceptual Captions
(synthetic fallback), FORDE towers with StatefulLayers, contrastive
training on a global batch, the two-timescale brain loop (GMM or
Forde-lite), and the mandated Brain Scan / Feature Space / Census
artifacts after every slow loop.
"""

from __future__ import annotations

import argparse
import time
from datetime import datetime
from typing import Optional

import jax
import numpy as np

from forde_tpu.brain.neuron_slow_loop import neuron_slow_loop_step
from forde_tpu.core import mesh as mesh_lib
from forde_tpu.core.config import (
    BrainConfig,
    DTypePolicy,
    DualEncoderConfig,
    TowerConfig,
    vit_b16_config,
    vit_tiny_config,
    vit_tiny_hd128_config,
)
from forde_tpu.data.prefetch import prefetch_to_device
from forde_tpu.data.vl import (
    AlignedDeviceRenderer,
    AlignedSyntheticVLDataset,
    SyntheticVLDataset,
    create_vl_dataset,
    hold_out_eval,
)
from forde_tpu.obs.metrics import MetricsWriter, ThroughputMeter
from forde_tpu.obs.plots import plot_brain_scan, plot_census, plot_feature_space
from forde_tpu.obs.retrieval import evaluate_retrieval
from forde_tpu.train import checkpoint as ckpt_lib
from forde_tpu.train.clip_step import (
    clip_train_step,
    create_clip_train_state,
    make_fused_step,
    make_nosense_step,
    stack_batches,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the FORDE dual encoder")
    p.add_argument("--preset",
                   choices=["tiny", "tiny_hd128", "vit_b16", "custom"],
                   default="tiny")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--text_len", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup; escapes the uniform-softmax "
                        "saddle at practical contrastive peak LRs")
    p.add_argument("--lr_schedule", choices=["constant", "cosine"],
                   default="constant",
                   help="post-warmup LR: constant, or cosine decay to "
                        "min_lr_ratio*peak over --decay_steps")
    p.add_argument("--decay_steps", type=int, default=0,
                   help="cosine decay horizon (after warmup); 0 = derive "
                        "from num_steps - warmup")
    p.add_argument("--min_lr_ratio", type=float, default=0.0,
                   help="cosine floor as a fraction of the peak LR")
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--tensor_parallelism", type=int, default=1,
                   help="size of the model mesh axis: Megatron "
                        "column/row GSPMD layout for tower attention + "
                        "StatefulLayer projections (core/mesh.tp_param_spec)")
    p.add_argument("--param_sharding", choices=["replicated", "fsdp"],
                   default="replicated",
                   help="fsdp = ZeRO-3-style param/moment sharding over "
                        "the data axis")
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--slow_loop_interval", type=int, default=100)
    p.add_argument("--sense_interval", type=int, default=1,
                   help="run FORDE sensing every k-th step (1 = every "
                        "step, reference parity). The stat reductions "
                        "cost ~29%% of a ViT-B step (PERF.md round 3); "
                        "the slow loop consumes time-averaged stats, so "
                        "k>1 trades sensing sample count for throughput "
                        "with the same optimization trajectory "
                        "(tests/test_sense_stride.py).")
    p.add_argument("--fuse_steps", type=int, default=1,
                   help="run k optimizer steps per dispatch as ONE "
                        "scanned program over a stacked batch "
                        "(train/clip_step.make_fused_step) — removes "
                        "the per-step host dispatch (~2 ms on the axon "
                        "tunnel) from the step cadence; identical math "
                        "and step order to k unfused steps "
                        "(tests/test_fuse_steps.py). Must be a multiple "
                        "of --sense_interval; log/slow-loop/eval "
                        "cadences round up to fuse boundaries.")
    p.add_argument("--forde_lite", action="store_true",
                   help="rule-based assignments instead of GMM (README.md:58)")
    p.add_argument("--gmm", action="store_true",
                   help="force GMM clustering (overrides a preset's forde_lite)")
    p.add_argument("--use_dummy_data", action="store_true")
    p.add_argument("--dummy_pool", type=int, default=0,
                   help="with --use_dummy_data: pregenerate this many "
                        "batches and cycle them (0 = fresh host RNG per "
                        "batch, which caps throughput at ~10 batches/s "
                        "— use a pool for throughput measurements)")
    p.add_argument("--use_aligned_data", action="store_true",
                   help="procedurally aligned (image, caption) pairs — "
                        "learnable offline; eval uses held-out classes")
    p.add_argument("--aligned_classes", type=int, default=4096)
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--experiment_name", type=str, default="forde_tpu_clip")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0 keeps an EMA of the params inside the jitted "
                        "step (checkpointed; eval also reports EMA "
                        "retrieval when enabled)")
    p.add_argument("--moment_dtype", type=str, default=None,
                   help="Adam moment storage dtype (e.g. bfloat16) — halves "
                        "optimizer HBM traffic; update math stays fp32")
    p.add_argument("--plots_dir", type=str, default="plots")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--eval_interval", type=int, default=0,
                   help="steps between retrieval evals (0 disables)")
    p.add_argument("--eval_batches", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    # custom-preset model knobs
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--embed_dim", type=int, default=512)
    p.add_argument("--tower_layers", type=int, default=0,
                   help="custom preset: override both towers' num_layers")
    p.add_argument("--tower_dim", type=int, default=0,
                   help="custom preset: override both towers' d_model "
                        "(heads/head_dim/mlp scale with it)")
    return p


def config_from_args(args) -> DualEncoderConfig:
    if args.preset == "vit_b16":
        cfg = vit_b16_config()
    elif args.preset == "tiny":
        cfg = vit_tiny_config()
    elif args.preset == "tiny_hd128":
        cfg = vit_tiny_hd128_config()
    else:
        towers = {}
        if args.tower_dim or args.tower_layers:
            d = args.tower_dim or 512
            heads = max(2, d // 64)
            tower = TowerConfig(
                d_model=d, num_layers=args.tower_layers or 12,
                num_heads=heads, head_dim=d // heads,
                mlp_hidden_dim=4 * d,
            )
            towers = {"vision": tower, "text": tower}
        cfg = DualEncoderConfig(
            image_size=args.image_size,
            patch_size=args.patch_size,
            embed_dim=args.embed_dim,
            **towers,
        )
    if args.forde_lite:
        cfg = cfg.replace(forde_lite=True)
    if args.gmm:
        cfg = cfg.replace(forde_lite=False)
    if args.bf16:
        cfg = cfg.replace(dtypes=DTypePolicy.bf16())
    if args.text_len:
        cfg = cfg.replace(max_text_len=args.text_len)
    return cfg


def train(args: Optional[argparse.Namespace] = None) -> dict:
    if args is None:
        args = build_parser().parse_args([])
    cfg = config_from_args(args)
    brain = BrainConfig()
    mesh_lib.maybe_initialize_distributed()
    mesh = mesh_lib.create_mesh_for_batch(
        args.batch_size, model=args.tensor_parallelism
    )

    rng = jax.random.PRNGKey(args.seed)
    rng, init_rng = jax.random.split(rng)
    t_init = time.perf_counter()
    if args.lr_schedule == "cosine" and args.decay_steps == 0:
        args.decay_steps = max(args.num_steps - args.warmup_steps, 1)
        print(f"cosine decay over {args.decay_steps} steps "
              f"(derived from the run length)")
    state = create_clip_train_state(
        cfg, init_rng, args.learning_rate, args.weight_decay,
        batch_size=args.batch_size, text_len=args.text_len,
        warmup_steps=args.warmup_steps,
        moment_dtype=args.moment_dtype,
        lr_schedule=args.lr_schedule,
        decay_steps=args.decay_steps,
        min_lr_ratio=args.min_lr_ratio,
    )
    from forde_tpu.train.state import shard_train_state

    if args.ema_decay > 0:
        from forde_tpu.train.ema import init_ema

        state = init_ema(state)  # before sharding/restore: part of the tree
    state = shard_train_state(state, mesh, param_sharding=args.param_sharding)
    n_params = sum(
        np.prod(p.shape) for p in jax.tree.leaves(state.params)
    )
    print(
        f"state created in {time.perf_counter() - t_init:.0f}s "
        f"({n_params / 1e6:.1f}M params); compiling train step...",
        flush=True,
    )

    manager = None
    if args.checkpoint_dir:
        manager = ckpt_lib.CheckpointManager(args.checkpoint_dir, keep=2)
        ckpt_lib.save_model_config(
            args.checkpoint_dir, cfg,
            train_meta={
                "moment_dtype": args.moment_dtype,
                "warmup_steps": args.warmup_steps,
                "ema_decay": args.ema_decay,
                "lr_schedule": args.lr_schedule,
                "decay_steps": args.decay_steps,
                "min_lr_ratio": args.min_lr_ratio,
            },
        )
        if args.resume and manager.latest_step() is not None:
            state = manager.restore(state)
            print(f"resumed from step {int(state.step)}")

    writer = MetricsWriter(
        f"runs/{args.experiment_name}_{datetime.now():%Y%m%d_%H%M%S}"
    )
    eval_batches = None  # materialized held-out eval set
    if args.use_aligned_data:
        # Train on classes [0, 0.9C), evaluate retrieval on a disjoint
        # held-out class range — generalization, not memorization.
        split = int(args.aligned_classes * 0.9)
        # Rendered ON DEVICE: only (B,) class ids cross the host->device
        # link per batch (the tunnel moves ~20 MB/s; fp32 image batches
        # would make training transfer-bound).
        dataset = AlignedDeviceRenderer(AlignedSyntheticVLDataset(
            args.batch_size, args.num_steps, image_size=cfg.image_size,
            text_len=args.text_len, vocab_size=cfg.vocab_size,
            num_classes=args.aligned_classes, class_range=(0, split),
            seed=args.seed,
        )).batches()
        if args.eval_interval > 0:
            def _eval_set(lo, hi, sample_seed):
                # SAME world seed as training; only sampling/noise differ.
                return list(AlignedDeviceRenderer(AlignedSyntheticVLDataset(
                    args.batch_size, args.eval_batches,
                    image_size=cfg.image_size, text_len=args.text_len,
                    vocab_size=cfg.vocab_size,
                    num_classes=args.aligned_classes,
                    class_range=(lo, hi), seed=args.seed,
                    sample_seed=sample_seed, distinct=True,
                )).batches())

            # Two held-out evals: "seen" = NEW noisy renders of training
            # classes (the standard held-out-pairs retrieval eval);
            # "unseen" = disjoint classes (compositional generalization).
            eval_batches = {
                "seen_": _eval_set(0, split, args.seed + 2),
                "unseen_": _eval_set(split, args.aligned_classes,
                                     args.seed + 1),
            }
    elif args.use_dummy_data:
        dataset = SyntheticVLDataset(
            args.batch_size, args.num_steps, image_size=cfg.image_size,
            text_len=args.text_len, vocab_size=cfg.vocab_size,
            pool=args.dummy_pool,
        )
        if args.eval_interval > 0:
            eval_batches = list(SyntheticVLDataset(
                args.batch_size, args.eval_batches,
                image_size=cfg.image_size, text_len=args.text_len,
                vocab_size=cfg.vocab_size, seed=args.seed + 1,
            ))
    else:
        dataset = create_vl_dataset(
            args.batch_size, num_batches=(
                args.num_steps + args.eval_batches
                if args.eval_interval > 0 else args.num_steps
            ),
            image_size=cfg.image_size, text_len=args.text_len,
        )
        if args.eval_interval > 0:
            # Hold out the FIRST eval_batches real batches for retrieval
            # eval; training never sees them (VERDICT r1 item 7).
            eval_batches, dataset = hold_out_eval(dataset, args.eval_batches)

    nosense_step = (
        make_nosense_step(cfg) if args.sense_interval > 1 else None
    )
    sensed_step = clip_train_step
    if args.ema_decay > 0:
        from forde_tpu.train.ema import with_ema

        sensed_step = with_ema(clip_train_step, args.ema_decay)
        if nosense_step is not None:
            nosense_step = with_ema(nosense_step, args.ema_decay)
    fuse = max(1, args.fuse_steps)
    fused_step = None
    if fuse > 1:
        if args.sense_interval > 1 and fuse % args.sense_interval:
            raise SystemExit(
                f"--fuse_steps ({fuse}) must be a multiple of "
                f"--sense_interval ({args.sense_interval})"
            )
        # Host-side cadences fire on `step % interval == 0` and step now
        # advances by `fuse` per dispatch — round them up to boundaries.
        for name in ("log_interval", "slow_loop_interval", "eval_interval"):
            v = getattr(args, name)
            if v > 0 and v % fuse:
                rounded = ((v + fuse - 1) // fuse) * fuse
                print(f"--{name} {v} -> {rounded} (rounded to a "
                      f"--fuse_steps boundary)")
                setattr(args, name, rounded)
        fused_step = make_fused_step(
            cfg, fuse, args.sense_interval,
            sensed_step=sensed_step, nosense_step=nosense_step,
        )
    meter = ThroughputMeter(items_per_step=args.batch_size * fuse)
    sharding = mesh_lib.batch_sharding(mesh)
    step = int(state.step)
    last = {}
    dispatched_once = False

    # Graceful preemption (mirrors train/loop.py): SIGTERM/SIGINT break
    # at the next step boundary; the normal final force-save runs.
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
            except ValueError:  # non-main thread
                pass

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    try:
        if args.use_dummy_data and args.dummy_pool:
            # Device-resident pool: upload each distinct batch ONCE and
            # cycle device arrays (with --fuse_steps: pre-stacked super-
            # batches). Re-uploading 25 MB images through the axon
            # tunnel every cycle would measure the tunnel, not the step.
            import itertools as _it

            # Pool images are stored in the COMPUTE dtype: the model's
            # first op casts them anyway (models/dual_encoder.py
            # patchify), so bf16 storage is numerically identical and
            # halves the pool's HBM. At fuse 32 / batch 512 / 224px the
            # f32 pool alone was 9.6 GB — the compile OOM'd a 15.75 GB
            # v5e by 271 MB.
            import jax.numpy as jnp
            compute_dt = jnp.dtype(cfg.dtypes.compute)

            def _device_batches():
                # lazy: each raw device batch is freed once its super-
                # batch is stacked — holding the whole raw pool AND the
                # stacked pool doubled HBM and OOM'd the v5e at pool 32
                for b in _it.islice(
                    iter(dataset), max(args.dummy_pool, fuse)
                ):
                    db = jax.device_put(b, sharding)
                    if compute_dt != jnp.float32:
                        db = dict(db, image=db["image"].astype(compute_dt))
                    yield db

            if fuse > 1:
                # prepare() splits each super-batch into scan operands
                # once, at pool-build time; the plain stacked buffer
                # frees immediately (see make_fused_step.prepare)
                pool = [
                    fused_step.prepare(sb)
                    for sb in stack_batches(
                        _device_batches(), fuse,
                        sharding=mesh_lib.stacked_batch_sharding(mesh),
                    )
                ]
            else:
                pool = list(_device_batches())

            def _cycle(items):
                i = 0
                while True:
                    yield items[i % len(items)]
                    i += 1

            batches = _cycle(pool)
        else:
            batches = prefetch_to_device(iter(dataset), sharding=sharding)
            if fuse > 1:
                batches = (
                    fused_step.prepare(sb)
                    for sb in stack_batches(
                        batches, fuse,
                        sharding=mesh_lib.stacked_batch_sharding(mesh),
                    )
                )
        for batch in batches:
            if stop_requested:
                break
            if fuse > 1:
                state, metrics = fused_step(state, batch)
                step += fuse
            else:
                if nosense_step is not None and step % args.sense_interval:
                    state, metrics = nosense_step(state, batch)
                else:
                    state, metrics = sensed_step(state, batch)
                step += 1
            if not dispatched_once:
                dispatched_once = True
                print(f"first step dispatched at step {step}", flush=True)
            meter.step()

            if step % args.log_interval == 0:
                last = {k: float(v) for k, v in metrics.items()}
                if not np.isfinite(last["loss/contrastive"]):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {last}"
                    )
                writer.scalars(last, step)
                pps = meter.items_per_sec_per_chip
                writer.scalar("Throughput/pairs_per_sec_per_chip", pps, step)
                print(
                    f"step {step}: loss {last['loss/contrastive']:.4f} "
                    f"acc_i {last['contrastive/acc_img']:.2f} "
                    f"grad_norm {last['training/grad_norm']:.2f} "
                    f"{pps:,.0f} pairs/s/chip"
                )
                if step <= args.log_interval:
                    # first logged window is dominated by compiles (the
                    # float() above just paid them); restart the meter so
                    # later prints report the warm steady-state rate
                    meter.reset()

            if args.slow_loop_interval > 0 and step % args.slow_loop_interval == 0:
                rng, slow_key = jax.random.split(rng)
                # Drain queued fast-loop work before timing: otherwise the
                # metric includes the backlog of async-dispatched train
                # steps, not the brain update (round-1 logged 230-270 ms
                # for a 34-53 ms computation because of this).
                jax.device_get(metrics["loss/contrastive"])
                t0 = time.perf_counter()
                new_brain, new_stats, new_grads, diag = neuron_slow_loop_step(
                    state.brain, state.stats_buffer, state.grad_stats,
                    state.grad_step_count, slow_key, brain=brain,
                    forde_lite=cfg.forde_lite,
                )
                state = state.replace(
                    brain=new_brain, stats_buffer=new_stats,
                    grad_stats=new_grads,
                    grad_step_count=state.grad_step_count * 0,
                )
                # One bulk transfer of the diagnostics dict; per-field
                # reads cost a tunnel round trip each.
                diag = jax.device_get(diag)
                dt_ms = (time.perf_counter() - t0) * 1000
                writer.scalar("SlowLoop/latency_ms", dt_ms, step)
                mode = "Forde-lite" if cfg.forde_lite else "GMM"
                print(f"[brain update @ {step}] mode={mode} {dt_ms:.0f}ms")
                if args.plots_dir and not bool(diag["skipped"]):
                    # one representative layer per tower for the artifacts
                    for name, d in list(diag["layers"].items())[:2]:
                        a = np.asarray(d["assignments"])
                        gh = int(np.sqrt(a.size)) or 1
                        while a.size % gh:
                            gh -= 1
                        tag = name.replace("/", "_")
                        plot_brain_scan(a.reshape(gh, -1), 0, step,
                                        f"{args.plots_dir}/{tag}")
                        plot_feature_space(
                            np.asarray(d["stats"])[:, :2], a, 0, step,
                            f"{args.plots_dir}/{tag}",
                            feature_names=("grad_gini", "grad_gdp"),
                        )
                        plot_census(a, 0, step, f"{args.plots_dir}/{tag}",
                                    num_clusters=brain.num_clusters,
                                    labels={0: "Generalist", 1: "Pooling",
                                            2: "Specialist"})

            if (
                args.eval_interval > 0
                and step % args.eval_interval == 0
                and eval_batches
            ):
                sets = (
                    eval_batches
                    if isinstance(eval_batches, dict)
                    else {"": eval_batches}
                )
                for prefix, batches_ in sets.items():
                    rmetrics = evaluate_retrieval(
                        state, batches_, prefix=prefix
                    )
                    if args.ema_decay > 0:
                        from forde_tpu.train.ema import swap_in_ema

                        rmetrics.update(evaluate_retrieval(
                            swap_in_ema(state), batches_,
                            prefix=f"ema_{prefix}",
                        ))
                    writer.scalars(rmetrics, step)
                    print(
                        f"[retrieval/{prefix or 'eval'} @ {step}] "
                        f"i2t R@1 "
                        f"{rmetrics[f'retrieval/{prefix}i2t_recall@1']:.3f} "
                        f"t2i R@1 "
                        f"{rmetrics[f'retrieval/{prefix}t2i_recall@1']:.3f}"
                    )

            if manager and step % max(args.slow_loop_interval, 100) == 0:
                manager.save(step, state)
            if step >= args.num_steps:
                break
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
        for sig, handler in prev_handlers.items():
            signal.signal(sig, handler)

    if manager:
        manager.save(step, state, force=True)
        manager.wait()
        manager.close()
    writer.close()
    return {"state": state, "final_metrics": last, "step": step,
            "pairs_per_sec_per_chip": meter.items_per_sec_per_chip}


def main():
    train(build_parser().parse_args())


if __name__ == "__main__":
    main()
