"""Device-prefetch queue: ordering, u8 decode, and producer-thread
lifetime when the consumer abandons the generator early (the train-loop
shape — --num_steps stops with the source iterator unexhausted).

Reference contrast: the reference's loop blocks on a synchronous
host->device copy every step (src/training/train.py:330-332) and has no
prefetch to leak; here the producer thread must not outlive an
abandoned consumer (it used to block on q.put forever, leaking a thread
plus `size` device batches per abandoned loop)."""

import threading
import time

import numpy as np
import pytest

from forde_tpu.data.prefetch import prefetch_to_device


def _batches(n, w=4):
    for i in range(n):
        yield {"x": np.full((2, w), i, np.float32)}


def test_roundtrip_order_and_exhaustion():
    out = list(prefetch_to_device(_batches(5), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2, 4), i))


def test_u8_batches_decode_to_unit_f32_on_device():
    it = prefetch_to_device(
        iter([{"img": np.full((2, 3), 255, np.uint8)}]), size=1
    )
    (b,) = list(it)
    assert b["img"].dtype == np.float32
    np.testing.assert_allclose(np.asarray(b["img"]), 1.0)


def test_source_error_reraised():
    def bad():
        yield {"x": np.zeros((1,), np.float32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(bad(), size=1)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_early_abandon_releases_producer_thread():
    before = {t.ident for t in threading.enumerate()}
    it = prefetch_to_device(_batches(10_000), size=2)
    next(it)  # producer is now running and will fill the queue
    it.close()  # abandon: GeneratorExit -> finally -> stop + drain
    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [
            t for t in threading.enumerate() if t.ident not in before
        ]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"
