"""Metrics logging + throughput metering + profiler hooks.

The reference logs TensorBoard scalars through torch's SummaryWriter
(src/training/train.py:40, 279-284, 356-362) with tags Loss/total, Loss/lm,
Loss/aux, Training/grad_norm. Same tags here, behind a writer that degrades
to JSONL when torch is unavailable, plus the per-chip throughput meter and
``jax.profiler`` trace hooks the reference lacks (SURVEY.md §5: no tracing,
no timers anywhere).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax


class MetricsWriter:
    """TensorBoard scalars with the reference's tag scheme; JSONL fallback."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n"
            )

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        for tag, value in metrics.items():
            self.scalar(tag, float(value), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        else:
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()


# Reference tag names (train.py:356-362) mapped from our metric keys.
REFERENCE_TAGS = {
    "loss/total": "Loss/total",
    "loss/lm": "Loss/lm",
    "loss/aux": "Loss/aux",
    "training/grad_norm": "Training/grad_norm",
}


class ThroughputMeter:
    """Tokens-or-pairs per second per chip — the north-star meter."""

    def __init__(self, items_per_step: int, num_chips: Optional[int] = None):
        self.items_per_step = items_per_step
        self.num_chips = num_chips or jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self, n: int = 1) -> None:
        self._steps += n

    @property
    def items_per_sec_per_chip(self) -> float:
        dt = time.perf_counter() - self._t0
        if dt == 0 or self._steps == 0:
            return 0.0
        return self._steps * self.items_per_step / dt / self.num_chips


@contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
