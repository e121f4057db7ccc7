"""Device prefetch: overlap host batch assembly with device compute.

The reference blocks the step loop on a synchronous ``jnp.array(batch)``
host->device copy every step (src/training/train.py:330-332). Here a
background thread assembles batches and enqueues async device transfers so
the next batch is already in HBM when the step finishes — the host side of
the double-buffering story (BASELINE.json north star).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@jax.jit
def _u8_to_unit_f32(x):
    return x.astype(jnp.float32) / 255.0


def prefetch_to_device(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Wrap a host batch iterator with a lookahead device-transfer queue.

    ``sharding``: optional target sharding (e.g. batch sharded over the
    ``data`` mesh axis); defaults to the default device.
    """
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    # Consumers routinely abandon this generator early (train loops stop
    # at --num_steps with the source iterator unexhausted). Without a
    # shutdown signal the producer thread then blocks on q.put FOREVER,
    # leaking one thread + `size` device-resident batches per abandoned
    # loop (observed as live producer threads in long pytest processes).
    # The stop event + timeout-put + drain-on-close below bound producer
    # lifetime to ~the put timeout after the consumer goes away.
    stop = threading.Event()

    def put(x):
        x = (
            jax.device_put(x, sharding)
            if sharding is not None
            else jax.device_put(x)
        )
        # uint8 image transport: ship 1/4 the bytes over the (slow) host->
        # device link, normalize to fp32 [0,1] on device (pairs with
        # data/native.batch_resize_u8).
        if x.dtype == jnp.uint8:
            x = _u8_to_unit_f32(x)
        return x

    def put_q(item) -> bool:
        """Enqueue unless/until the consumer signalled shutdown."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                if not put_q(jax.tree.map(put, batch)):
                    return
            put_q(sentinel)
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            put_q(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:  # unblock a producer waiting on a full queue
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
