"""ctypes bindings for the native (C++) host-ingest batcher.

Compiles ``forde_tpu/native/batcher.cpp`` with g++ on first use (cached
next to the source) and exposes:

  * ``batch_resize_normalize(images, out_h, out_w, threads)`` — threaded
    bilinear resize + /255 normalize + NHWC pack of a list of uint8 images.
  * ``batch_pad_tokens(seqs, max_len, pad_id)`` — ragged int32 token
    sequences -> padded (input_ids, attention_mask).

Falls back to a pure-numpy implementation when no compiler is available,
so the pipeline never hard-depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "batcher.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libbatcher.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception as exc:  # noqa: BLE001
        print(f"[forde_tpu.native] build failed, using numpy fallback: {exc}")
        return None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        path = _LIB
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(
            _SRC
        ):
            path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.batch_resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.batch_resize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.batch_pad_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def batch_resize_u8(
    images: List[np.ndarray], out_h: int = 224, out_w: int = 224,
    threads: int = 0,
) -> np.ndarray:
    """Resize a list of uint8 HWC images to one uint8 NHWC batch.

    The fp32 normalize step moves to the device: a remote-accelerator
    host->device link (the axon tunnel moves ~20 MB/s) makes image-batch
    bytes the training bottleneck, and uint8 is 4x smaller than fp32.
    Pair with ``prefetch.prefetch_to_device`` which converts uint8 image
    leaves to fp32/255 on device after the transfer.
    """
    assert images, "empty batch"
    channels = images[0].shape[-1]
    lib = load_library()
    if lib is None:
        f32 = _resize_normalize_numpy(images, out_h, out_w)
        return np.clip(f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)

    images = [np.ascontiguousarray(img, dtype=np.uint8) for img in images]
    n = len(images)
    ptrs = (ctypes.c_void_p * n)(
        *[img.ctypes.data_as(ctypes.c_void_p) for img in images]
    )
    heights = np.asarray([img.shape[0] for img in images], np.int32)
    widths = np.asarray([img.shape[1] for img in images], np.int32)
    out = np.empty((n, out_h, out_w, channels), np.uint8)
    lib.batch_resize_u8(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h,
        out_w,
        threads,
    )
    return out


def _resize_normalize_numpy(
    images: List[np.ndarray], out_h: int, out_w: int
) -> np.ndarray:
    out = np.empty((len(images), out_h, out_w, images[0].shape[-1]), np.float32)
    for i, img in enumerate(images):
        sh, sw = img.shape[:2]
        fy = np.clip((np.arange(out_h) + 0.5) * sh / out_h - 0.5, 0, sh - 1)
        fx = np.clip((np.arange(out_w) + 0.5) * sw / out_w - 0.5, 0, sw - 1)
        y0 = fy.astype(np.int32)
        x0 = fx.astype(np.int32)
        y1 = np.minimum(y0 + 1, sh - 1)
        x1 = np.minimum(x0 + 1, sw - 1)
        dy = (fy - y0)[:, None, None]
        dx = (fx - x0)[None, :, None]
        im = img.astype(np.float32)
        top = im[y0][:, x0] * (1 - dx) + im[y0][:, x1] * dx
        bot = im[y1][:, x0] * (1 - dx) + im[y1][:, x1] * dx
        out[i] = (top * (1 - dy) + bot * dy) / 255.0
    return out


def batch_resize_normalize(
    images: List[np.ndarray], out_h: int = 224, out_w: int = 224,
    threads: int = 0,
) -> np.ndarray:
    """Resize a list of uint8 HWC images to one float32 [0,1] NHWC batch."""
    assert images, "empty batch"
    channels = images[0].shape[-1]
    lib = load_library()
    if lib is None:
        return _resize_normalize_numpy(images, out_h, out_w)

    images = [np.ascontiguousarray(img, dtype=np.uint8) for img in images]
    n = len(images)
    ptrs = (ctypes.c_void_p * n)(
        *[img.ctypes.data_as(ctypes.c_void_p) for img in images]
    )
    heights = np.asarray([img.shape[0] for img in images], np.int32)
    widths = np.asarray([img.shape[1] for img in images], np.int32)
    out = np.empty((n, out_h, out_w, channels), np.float32)
    lib.batch_resize_normalize(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_h,
        out_w,
        threads,
    )
    return out


def batch_pad_tokens(
    seqs: List[np.ndarray], max_len: int, pad_id: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Pack ragged int32 token sequences into (input_ids, attention_mask)."""
    n = len(seqs)
    lib = load_library()
    seqs = [np.ascontiguousarray(s, dtype=np.int32) for s in seqs]
    if lib is None:
        ids = np.full((n, max_len), pad_id, np.int32)
        mask = np.zeros((n, max_len), np.int32)
        for i, s in enumerate(seqs):
            ln = min(len(s), max_len)
            ids[i, :ln] = s[:ln]
            mask[i, :ln] = 1
        return ids, mask

    ptrs = (ctypes.c_void_p * n)(
        *[s.ctypes.data_as(ctypes.c_void_p) for s in seqs]
    )
    lengths = np.asarray([len(s) for s in seqs], np.int32)
    ids = np.empty((n, max_len), np.int32)
    mask = np.empty((n, max_len), np.int32)
    lib.batch_pad_tokens(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        max_len,
        pad_id,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return ids, mask
