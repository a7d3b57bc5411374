"""ctypes bindings for the native data-path library (native/data_ops.cc).

Builds `libdata_ops.so` with g++ on first use (cached beside the source) and
exposes GIL-free collation / action-tokenization / image-normalization fast
paths. Every entry point has a NumPy fallback, so the package works without a
compiler; `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _build() -> Optional[str]:
    src = os.path.join(_native_dir(), "data_ops.cc")
    out = os.path.join(_native_dir(), "libdata_ops.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
                       check=True, capture_output=True, timeout=120)
        return out
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pad_stack_i32.argtypes = [i32p, i32p, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int32, i32p]
    lib.pad_stack_i32.restype = ctypes.c_int
    lib.attention_mask_i32.argtypes = [i32p, ctypes.c_int, ctypes.c_int, i32p]
    lib.encode_actions_i32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_float, ctypes.c_float,
                                       ctypes.c_int, i32p]
    lib.decode_actions_f32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_float, ctypes.c_float,
                                       ctypes.c_int, f32p]
    lib.normalize_image_f32.argtypes = [u8p, ctypes.c_int64, f32p, f32p, f32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _lib() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pad_stack(seqs, target: int, fill: int) -> np.ndarray:
    """Pad variable-length int sequences to (n, target)."""
    n = len(seqs)
    lib = _lib()
    lengths = np.asarray([len(s) for s in seqs], np.int32)
    if lib is None:
        out = np.full((n, target), fill, np.int32)
        for i, s in enumerate(seqs):
            if len(s) > target:
                raise ValueError(f"sequence {len(s)} exceeds target {target}")
            out[i, :len(s)] = s
        return out
    flat = np.ascontiguousarray(np.concatenate(
        [np.asarray(s, np.int32) for s in seqs]) if n else
        np.zeros(0, np.int32))
    out = np.empty((n, target), np.int32)
    rc = lib.pad_stack_i32(_i32ptr(flat), _i32ptr(lengths), n, target,
                           fill, _i32ptr(out))
    if rc != 0:
        raise ValueError(f"a sequence exceeds target {target}")
    return out


def attention_mask(lengths, target: int) -> np.ndarray:
    lib = _lib()
    lengths = np.asarray(lengths, np.int32)
    if lib is None:
        return (np.arange(target)[None, :] < lengths[:, None]).astype(np.int32)
    out = np.empty((len(lengths), target), np.int32)
    lib.attention_mask_i32(_i32ptr(lengths), len(lengths), target, _i32ptr(out))
    return out


def encode_actions(actions: np.ndarray, bins: int = 256,
                   min_action: float = -1.0, max_action: float = 1.0,
                   vocab_size: int = 32000) -> np.ndarray:
    lib = _lib()
    a = np.ascontiguousarray(actions, np.float32)
    if lib is None:
        edges = np.linspace(min_action, max_action, bins)
        return (vocab_size - np.digitize(np.clip(a, min_action, max_action),
                                         edges)).astype(np.int32)
    out = np.empty(a.shape, np.int32)
    lib.encode_actions_i32(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), a.size, bins,
        min_action, max_action, vocab_size, _i32ptr(out.reshape(-1)))
    return out


def decode_actions(ids: np.ndarray, bins: int = 256, min_action: float = -1.0,
                   max_action: float = 1.0, vocab_size: int = 32000) -> np.ndarray:
    lib = _lib()
    i = np.ascontiguousarray(ids, np.int32)
    if lib is None:
        edges = np.linspace(min_action, max_action, bins)
        centers = (edges[:-1] + edges[1:]) / 2.0
        d = np.clip(vocab_size - i - 1, 0, bins - 2)
        return centers[d].astype(np.float32)
    out = np.empty(i.shape, np.float32)
    lib.decode_actions_f32(
        _i32ptr(i.reshape(-1)), i.size, bins, min_action, max_action,
        vocab_size, out.reshape(-1).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)))
    return out


def normalize_image(img: np.ndarray, mean, std) -> np.ndarray:
    """uint8 (..., 3) -> float32 normalized."""
    lib = _lib()
    u8 = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return ((u8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
                / np.asarray(std, np.float32))
    out = np.empty(u8.shape, np.float32)
    # the C kernel indexes mean[0..2]/std[0..2]: broadcast scalars to 3
    # channels (the NumPy fallback broadcasts implicitly — keep them equal)
    m = np.ascontiguousarray(np.broadcast_to(
        np.asarray(mean, np.float32), (3,)))
    s = np.ascontiguousarray(np.broadcast_to(
        np.asarray(std, np.float32), (3,)))
    fp = ctypes.POINTER(ctypes.c_float)
    lib.normalize_image_f32(
        u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), u8.size // 3,
        m.ctypes.data_as(fp), s.ctypes.data_as(fp),
        out.reshape(-1).ctypes.data_as(fp))
    return out
