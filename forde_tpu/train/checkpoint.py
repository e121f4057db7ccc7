"""Orbax checkpointing with restore/resume.

The reference saves one final Flax checkpoint and has NO restore path at
all (src/training/train.py:412-422; grep-verified in SURVEY.md §5). Here:
async Orbax checkpointing of the full TrainState — params, optimizer
state, step, and the FORDE stats_buffer/brain state — with periodic saves
and resume.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import orbax.checkpoint as ocp

from forde_tpu.train.state import TrainState

MODEL_CONFIG_FILENAME = "model_config.json"


def save_model_config(directory: str, config, train_meta: Optional[dict] = None) -> None:
    """Write the model config next to the Orbax steps so serving can
    reconstruct the exact architecture with zero shape flags
    (VERDICT r2 #9; forde_tpu/serve.py). ``train_meta`` records training
    choices that shape the SAVED STATE rather than the model — e.g. the
    optimizer moment dtype, which restore must reproduce structurally."""
    from forde_tpu.core.config import config_to_dict

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, MODEL_CONFIG_FILENAME)
    with open(path, "w") as f:
        json.dump(
            {"model": config_to_dict(config), "train": train_meta or {}},
            f,
            indent=1,
        )


def _read_meta(directory: str) -> Optional[dict]:
    path = os.path.join(directory, MODEL_CONFIG_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_model_config(directory: str):
    """Load the saved model config, or None for pre-config checkpoints."""
    from forde_tpu.core.config import config_from_dict

    d = _read_meta(directory)
    return None if d is None else config_from_dict(d["model"])


def _optimizer_meta(meta: dict) -> dict:
    """Everything in the train meta that shapes the OPTIMIZER state tree
    (restore must rebuild an identical one): moment dtype, and the LR
    schedule (warmup or cosine swaps the stateless LR scale for a
    ScaleByScheduleState)."""
    return dict(
        warmup_steps=int(meta.get("warmup_steps", 0) or 0),
        moment_dtype=meta.get("moment_dtype"),
        lr_schedule=meta.get("lr_schedule") or "constant",
        decay_steps=int(meta.get("decay_steps", 0) or 0),
        min_lr_ratio=float(meta.get("min_lr_ratio", 0.0) or 0.0),
    )


def load_train_meta(directory: str) -> dict:
    d = _read_meta(directory)
    return (d or {}).get("train", {})


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, keep: int = 1, async_save: bool = True):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        if step in (self._mgr.all_steps() or []):
            # final force-save often coincides with an interval save;
            # orbax raises StepAlreadyExistsError rather than no-op. A
            # forced save REPLACES the existing step — but never
            # delete-then-write (a crash mid-write would destroy the only
            # copy): the new state is written to a sibling temp manager
            # first, and only once it is durable on disk is the old step
            # swapped out (delete + atomic rename of the finished dir).
            if not force:
                return False
            self._mgr.wait_until_finished()
            import jax

            multi = jax.process_count() > 1
            if multi:  # barriers around the uncoordinated fs swap below
                from jax.experimental import multihost_utils
            root = str(self._mgr.directory)
            tmp_root = os.path.join(root, f"_replace_{step}")
            if jax.process_index() == 0:
                shutil.rmtree(tmp_root, ignore_errors=True)
            if multi:
                multihost_utils.sync_global_devices("forde_ckpt_tmp_clean")
            # orbax coordinates the multi-host temp save itself
            tmp_mgr = ocp.CheckpointManager(
                tmp_root,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=False
                ),
            )
            try:
                ok = tmp_mgr.save(step, args=ocp.args.StandardSave(state))
                tmp_mgr.wait_until_finished()
            finally:
                tmp_mgr.close()
            if not ok:
                if jax.process_index() == 0:
                    shutil.rmtree(tmp_root, ignore_errors=True)
                return False
            # the directory swap is plain-filesystem work: exactly one
            # process performs it, everyone else waits at the barrier
            if jax.process_index() == 0:
                shutil.rmtree(os.path.join(root, str(step)))
                os.replace(
                    os.path.join(tmp_root, str(step)),
                    os.path.join(root, str(step)),
                )
                shutil.rmtree(tmp_root, ignore_errors=True)
            if multi:
                multihost_utils.sync_global_devices("forde_ckpt_replaced")
            self._mgr.reload()  # re-scan steps from disk
            return True
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state`` (abstract target)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_checkpoint(directory: str, state: TrainState, step: int) -> None:
    """One-shot save (reference save-only flow, train.py:413-421)."""
    mgr = CheckpointManager(directory, keep=1)
    mgr.save(step, state, force=True)
    mgr.wait()
    mgr.close()


def restore_checkpoint(
    directory: str, state: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore latest (or given step) checkpoint into ``state``'s structure."""
    mgr = CheckpointManager(directory, keep=1)
    try:
        return mgr.restore(state, step)
    finally:
        mgr.close()


def load_lm_state(
    checkpoint_dir: str,
    init_seq_len: int = 64,
    lora_base_dir: Optional[str] = None,
):
    """(config, restored TrainState) for LM inference from a train.loop
    checkpoint dir. The ONE restore recipe (serve target, serve draft,
    distillation teacher): rebuild a state whose tree structure matches
    what was saved — moment dtype and warmup schedule from the train
    meta, EMA seeded when the run kept one — then restore into it.
    Dropout is zeroed (inference).

    LoRA checkpoints (train meta carries ``lora``; --lora_rank runs save
    ADAPTERS as the params) are resolved transparently: the frozen base
    is loaded from the recorded path (override with ``lora_base_dir`` if
    it moved), the adapter state is restored, and the returned state's
    params (and EMA, if kept) are the base with adapters MERGED — every
    downstream consumer sees an ordinary dense state."""
    import jax

    from forde_tpu.train.state import create_train_state

    config = load_model_config(checkpoint_dir)
    assert config is not None, (
        f"{checkpoint_dir} has no model_config.json (written by train.loop)"
    )
    config = config.replace(dropout_rate=0.0)
    meta = load_train_meta(checkpoint_dir)
    opt_meta = _optimizer_meta(meta)
    lora_meta = meta.get("lora")
    if lora_meta:
        from forde_tpu.models.decoder_lm import FORDEDecoderLM
        from forde_tpu.train import lora as lora_lib
        from forde_tpu.train.state import TrainState, make_optimizer

        base_dir = lora_base_dir or lora_meta["base"]
        _, base_params, base_stats = load_lm_params(base_dir, init_seq_len)
        adapters = lora_lib.init_lora(
            base_params, int(lora_meta["rank"]), jax.random.PRNGKey(0),
            targets=tuple(lora_meta["targets"]),
        )
        tx = make_optimizer(1e-4, 0.0, **opt_meta)
        model = FORDEDecoderLM(config=config)
        state = TrainState.create(
            apply_fn=model.apply, params=adapters, tx=tx,
            stats_buffer=base_stats,
        )
        if float(meta.get("ema_decay", 0.0) or 0.0) > 0:
            from forde_tpu.train.ema import init_ema

            state = init_ema(state)
        state = restore_checkpoint(checkpoint_dir, state)
        scale = lora_lib.lora_scale(
            int(lora_meta["rank"]), float(lora_meta["alpha"])
        )
        merged = lora_lib.merge_lora(base_params, state.params, scale)
        ema = state.ema_params
        if ema is not None:
            ema = lora_lib.merge_lora(base_params, ema, scale)
        return config, state.replace(params=merged, ema_params=ema)
    state = create_train_state(
        config, jax.random.PRNGKey(0), learning_rate=1e-4, weight_decay=0.0,
        init_batch_shape=(1, min(init_seq_len, config.max_seq_len)),
        **opt_meta,
    )
    if float(meta.get("ema_decay", 0.0) or 0.0) > 0:
        from forde_tpu.train.ema import init_ema

        state = init_ema(state)
    return config, restore_checkpoint(checkpoint_dir, state)


def load_lm_params(checkpoint_dir: str, init_seq_len: int = 64):
    """(config, params, stats_buffer) from a train.loop checkpoint —
    the warm-start/--init_from loader (optimizer state is rebuilt fresh
    by the caller). LoRA checkpoints arrive merged (load_lm_state)."""
    config, state = load_lm_state(checkpoint_dir, init_seq_len)
    return config, state.params, state.stats_buffer


def load_clip_state(checkpoint_dir: str):
    """(config, restored CLIPTrainState) — the dual-encoder twin of
    ``load_lm_state`` (used by the embedding CLI). Tap/stat leaves are
    batch-independent, so a batch-1 init builds the exact saved tree."""
    import jax

    from forde_tpu.train.clip_step import create_clip_train_state

    config = load_model_config(checkpoint_dir)
    assert config is not None, (
        f"{checkpoint_dir} has no model_config.json (written by clip_loop)"
    )
    meta = load_train_meta(checkpoint_dir)
    state = create_clip_train_state(
        config, jax.random.PRNGKey(0), learning_rate=1e-4, weight_decay=0.0,
        batch_size=1, **_optimizer_meta(meta),
    )
    if float(meta.get("ema_decay", 0.0) or 0.0) > 0:
        from forde_tpu.train.ema import init_ema

        state = init_ema(state)
    return config, restore_checkpoint(checkpoint_dir, state)
