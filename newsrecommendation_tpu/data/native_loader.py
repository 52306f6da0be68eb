"""ctypes bridge to the native MIND parser (native/mindio.cpp).

Builds the shared library on demand with g++ (cached next to the source),
and degrades gracefully: if the toolchain or build is unavailable,
``available()`` returns False and the pure-Python parsers in loader.py are
used instead. The native path is ~20-50x faster on large behaviors shards —
it exists so host-side parsing never gates TPU feed rate.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "mindio.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "_build", "libmindio.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


class _TrainResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("history", ctypes.POINTER(ctypes.c_int32)),
        ("history_mask", ctypes.POINTER(ctypes.c_float)),
        ("pos", ctypes.POINTER(ctypes.c_int32)),
        ("neg", ctypes.POINTER(ctypes.c_int32)),
    ]


class _EvalResult(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("history", ctypes.POINTER(ctypes.c_int32)),
        ("history_mask", ctypes.POINTER(ctypes.c_float)),
        ("candidates", ctypes.POINTER(ctypes.c_int32)),
        ("labels", ctypes.POINTER(ctypes.c_float)),
        ("candidate_mask", ctypes.POINTER(ctypes.c_float)),
        ("truncated", ctypes.c_int64),
        ("max_width", ctypes.c_int64),
    ]


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH,
           _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception as e:  # toolchain missing / compile error
        logging.warning("mindio native build failed (%s); using Python parser", e)
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.mindio_index_create.restype = ctypes.c_void_p
        lib.mindio_index_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_int32]
        lib.mindio_index_free.argtypes = [ctypes.c_void_p]
        lib.mindio_parse_train.restype = ctypes.c_int64
        lib.mindio_parse_train.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(_TrainResult)]
        lib.mindio_parse_eval.restype = ctypes.c_int64
        lib.mindio_parse_eval.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(_EvalResult)]
        lib.mindio_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _take(lib, ptr, shape, dtype):
    """Copy a malloc'd buffer into numpy and free it."""
    count = int(np.prod(shape))
    arr = np.ctypeslib.as_array(ptr, shape=(count,)).astype(dtype, copy=True)
    lib.mindio_free(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(shape)


def _make_index(lib, news_index: Dict[str, int]):
    handle = lib.mindio_index_create()
    for doc_id, idx in news_index.items():
        lib.mindio_index_add(handle, doc_id.encode("utf-8"), idx)
    return handle


def parse_train_file(path: str, news_index: Dict[str, int], L: int, K: int):
    """Native equivalent of TrainSamples.from_file's parse.

    Returns (history (N,L) i32, mask (N,L) f32, pos (N,) i32, neg (N,K) i32)
    or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    handle = _make_index(lib, news_index)
    try:
        res = _TrainResult()
        n = lib.mindio_parse_train(handle, path.encode(), L, K,
                                   ctypes.byref(res))
        if n < 0:
            raise IOError(f"mindio: cannot read {path}")
        return (
            _take(lib, res.history, (n, L), np.int32),
            _take(lib, res.history_mask, (n, L), np.float32),
            _take(lib, res.pos, (n,), np.int32),
            _take(lib, res.neg, (n, K), np.int32),
        )
    finally:
        lib.mindio_index_free(handle)


def parse_eval_file(path: str, news_index: Dict[str, int], L: int, C: int):
    """Native equivalent of EvalSamples.from_file's parse (fixed width C).

    Returns (history, mask, candidates, labels, candidate_mask, truncated,
    max_width) where ``truncated`` is the number of impressions with more
    than C candidates and ``max_width`` the widest impression observed —
    the caller decides whether truncation is an error (loader.py guard).
    """
    lib = _load()
    if lib is None:
        return None
    handle = _make_index(lib, news_index)
    try:
        res = _EvalResult()
        n = lib.mindio_parse_eval(handle, path.encode(), L, C,
                                  ctypes.byref(res))
        if n < 0:
            raise IOError(f"mindio: cannot read {path}")
        return (
            _take(lib, res.history, (n, L), np.int32),
            _take(lib, res.history_mask, (n, L), np.float32),
            _take(lib, res.candidates, (n, C), np.int32),
            _take(lib, res.labels, (n, C), np.float32),
            _take(lib, res.candidate_mask, (n, C), np.float32),
            int(res.truncated),
            int(res.max_width),
        )
    finally:
        lib.mindio_index_free(handle)
