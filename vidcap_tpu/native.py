"""ctypes bindings for the native host library (native/vidcap_native.cpp).

Auto-builds with g++ on first use (cached .so); every entry point has a
pure-Python fallback so the framework runs without a toolchain. The native paths
accelerate the host-side data/reward-table pipeline (SURVEY.md §2.2): PTB
tokenization (reference: Java PTBTokenizer jar) and reference n-gram
counting/hashing for the on-device CIDEr tables.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libvidcap_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("VIDCAP_NO_NATIVE") == "1":
        return None
    src = os.path.join(_REPO_ROOT, "native", "vidcap_native.cpp")
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
            subprocess.run(
                ["sh", os.path.join(_REPO_ROOT, "native", "build.sh")],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO_PATH)
        lib.vc_ngram_hash.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
        lib.vc_ref_ngrams.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.vc_ref_ngrams.restype = ctypes.c_int
        lib.vc_tokenize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int]
        lib.vc_tokenize.restype = ctypes.c_int
        lib.vc_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"[vidcap] native lib unavailable ({e}); using python fallbacks",
              file=sys.stderr)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------- wrappers

def ngram_hash(tokens: Sequence[int], order: int) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        from vidcap_tpu.ops.ngram_hash import host_ngram_key
        return host_ngram_key(tokens, order)
    arr = np.asarray(tokens, np.int32)
    lo = ctypes.c_uint32()
    hi = ctypes.c_uint32()
    lib.vc_ngram_hash(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                      order, ctypes.byref(lo), ctypes.byref(hi))
    return lo.value, hi.value


def ref_ngrams(tokens: Sequence[int], max_order: int = 4
               ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]]:
    """Unique (key_lo, key_hi, tf, order) entries for one reference, or None if
    the native lib is unavailable (caller falls back to python)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.asarray(tokens, np.int32)
    cap = max(4 * max(len(arr), 1), 16)
    lo = np.zeros(cap, np.uint32)
    hi = np.zeros(cap, np.uint32)
    tf = np.zeros(cap, np.float32)
    order = np.zeros(cap, np.int32)
    n = lib.vc_ref_ngrams(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr),
        max_order,
        lo.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        hi.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n < 0:
        return None
    return lo[:n], hi[:n], tf[:n], order[:n]


def tokenize(text: str) -> Optional[List[str]]:
    lib = _load()
    if lib is None:
        return None
    buf = ctypes.create_string_buffer(4 * len(text.encode()) + 16)
    n = lib.vc_tokenize(text.encode("utf-8", "ignore"), buf, len(buf))
    s = buf.value.decode("utf-8", "ignore")
    return s.split(" ") if s else []
