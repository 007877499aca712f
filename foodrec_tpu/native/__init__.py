# coding: utf-8
"""Native host-runtime bindings (g++-built, ctypes-loaded; see fastload.cpp).

`lib()` builds the shared object on first use (cached next to the source,
rebuilt when the .cpp changes) and returns the ctypes handle, or None when no
compiler is available — callers fall back to the pure-Python paths.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastload.cpp")
_SO = os.path.join(_DIR, "_fastload.so")

_lib = None
_tried = False


def lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.isfile(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
                 "-o", _SO],
                check=True, capture_output=True)
        h = ctypes.CDLL(_SO)
        h.parse_negatives.restype = ctypes.c_long
        h.parse_negatives.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32)]
        h.build_eval_set.restype = None
        h.build_eval_set.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        h.pack_bitmap.restype = None
        h.pack_bitmap.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_uint32)]
        _lib = h
    except Exception:
        _lib = None
    return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_negatives(path, n_neg):
    """.negative file -> int32 [rows, n_neg], or None if native unavailable
    or the file is ragged (python fallback handles that)."""
    h = lib()
    if h is None:
        return None
    with open(path, "rb") as f:
        buf = f.read()
    rows = buf.count(b"\n") + (0 if buf.endswith(b"\n") or not buf else 1)
    out = np.empty((rows, n_neg), dtype=np.int32)
    got = h.parse_negatives(buf, len(buf), rows, n_neg,
                            _ptr(out, ctypes.c_int32))
    if got < 0:
        return None
    return out[:got]


def build_eval_set_arrays(pos_lists, negs, width):
    """Padded candidate rows from ragged positives + [U, K] negatives."""
    h = lib()
    if h is None:
        return None
    U, K = negs.shape
    pos_off = np.zeros(U + 1, dtype=np.int64)
    for u, p in enumerate(pos_lists):
        pos_off[u + 1] = pos_off[u] + len(p)
    pos_flat = np.fromiter(
        (x for p in pos_lists for x in p), dtype=np.int32,
        count=int(pos_off[-1]))
    negs = np.ascontiguousarray(negs, dtype=np.int32)
    cand = np.empty((U, width), dtype=np.int32)
    n_pos = np.empty(U, dtype=np.int32)
    n_cand = np.empty(U, dtype=np.int32)
    h.build_eval_set(_ptr(pos_flat, ctypes.c_int32),
                     _ptr(pos_off, ctypes.c_int64), U,
                     _ptr(negs, ctypes.c_int32), K, width,
                     _ptr(cand, ctypes.c_int32), _ptr(n_pos, ctypes.c_int32),
                     _ptr(n_cand, ctypes.c_int32))
    return cand, n_pos, n_cand


def pack_bitmap(users, items, n_users, n_items):
    h = lib()
    if h is None:
        return None
    words = (n_items + 31) // 32
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    bitmap = np.zeros((n_users, words), dtype=np.uint32)
    h.pack_bitmap(_ptr(users, ctypes.c_int64), _ptr(items, ctypes.c_int64),
                  len(users), words, _ptr(bitmap, ctypes.c_uint32))
    return bitmap
