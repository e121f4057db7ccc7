"""Native C++ ingest batcher: build, correctness vs numpy reference,
token padding, threading."""

import numpy as np
import pytest

from forde_tpu.data import native


def test_library_builds_and_loads():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain in this environment")


def test_resize_normalize_matches_numpy_reference():
    rng = np.random.RandomState(0)
    images = [
        rng.randint(0, 256, (37, 53, 3), np.uint8),
        rng.randint(0, 256, (224, 224, 3), np.uint8),
        rng.randint(0, 256, (480, 640, 3), np.uint8),
    ]
    out = native.batch_resize_normalize(images, 32, 32, threads=2)
    ref = native._resize_normalize_numpy(images, 32, 32)
    assert out.shape == (3, 32, 32, 3)
    assert out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_resize_identity_size():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    out = native.batch_resize_normalize([img], 16, 16)
    np.testing.assert_allclose(out[0], img.astype(np.float32) / 255.0, atol=1e-6)


def test_batch_pad_tokens():
    seqs = [np.arange(5, dtype=np.int32), np.arange(12, dtype=np.int32)]
    ids, mask = native.batch_pad_tokens(seqs, max_len=8, pad_id=0)
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    np.testing.assert_array_equal(ids[0], [0, 1, 2, 3, 4, 0, 0, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0, 0, 0])
    # truncation
    np.testing.assert_array_equal(ids[1], np.arange(8))
    np.testing.assert_array_equal(mask[1], np.ones(8))


def test_many_threads_consistent():
    rng = np.random.RandomState(2)
    images = [rng.randint(0, 256, (64, 96, 3), np.uint8) for _ in range(32)]
    a = native.batch_resize_normalize(images, 48, 48, threads=1)
    b = native.batch_resize_normalize(images, 48, 48, threads=8)
    np.testing.assert_array_equal(a, b)
