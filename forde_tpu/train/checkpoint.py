"""Orbax checkpointing with restore/resume.

The reference saves one final Flax checkpoint and has NO restore path at
all (src/training/train.py:412-422; grep-verified in SURVEY.md §5). Here:
async Orbax checkpointing of the full TrainState — params, optimizer
state, step, and the FORDE stats_buffer/brain state — with periodic saves
and resume.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from forde_tpu.train.state import TrainState


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
            # forced save REPLACES the existing step (delete then save) so
            # re-saving updated state to the same step is possible.
            if not force:
                return False
            self._mgr.wait_until_finished()
            self._mgr.delete(step)
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
