"""ctypes bindings for the native C++ runtime components.

The reference is pure Python (SURVEY.md §2.3 "native components: none");
this module is build-scope: `native/src/tripleloader.cpp` is an
mmap-and-intern triple-file parser (~6x the pure-Python loader end-to-end at FB15k scale) exposed
through a C ABI (no pybind11 in this image). The library is compiled on
first use with g++ via the checked-in Makefile and cached under
native/build/; every entry point degrades gracefully to the Python
implementation in `skge_tpu.data` when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libtripleloader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        srcs = [
            os.path.join(_NATIVE_DIR, "src", f)
            for f in ("tripleloader.cpp", "partitioner.cpp")
        ]
        stale = os.path.exists(_LIB_PATH) and any(
            os.path.getmtime(f) > os.path.getmtime(_LIB_PATH)
            for f in srcs if os.path.exists(f)
        )
        if not os.path.exists(_LIB_PATH) or stale:
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.tl_load.restype = ctypes.c_void_p
        lib.tl_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.tl_error.restype = ctypes.c_char_p
        lib.tl_error.argtypes = [ctypes.c_void_p]
        for fn in ("tl_n_triples", "tl_n_entities", "tl_n_relations", "tl_n_files"):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        lib.tl_file_n_triples.restype = ctypes.c_int64
        lib.tl_file_n_triples.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tl_copy_triples.restype = None
        lib.tl_copy_triples.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        for fn in ("tl_entity_name", "tl_relation_name"):
            getattr(lib, fn).restype = ctypes.c_char_p
            getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.tl_free.restype = None
        lib.tl_free.argtypes = [ctypes.c_void_p]
        lib.skge_greedy_partition.restype = ctypes.c_int
        lib.skge_greedy_partition.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _ensure_lib() is not None


def load_triple_files(paths, order: str = "spo", with_names: bool = True):
    """Parse one or more raw triple text files natively.

    All files share ONE interned entity/relation vocabulary (train/valid/test
    must agree on ids). Returns (splits, entities, relations) where `splits`
    is a list of (N_i, 3) int32 arrays in (s, o, p) order, one per input
    path; with_names=False returns vocab SIZES instead of name lists.
    Raises RuntimeError on parse errors; returns None (caller should fall
    back to the Python loader) when the native library is unavailable.
    """
    if isinstance(paths, str):
        paths = [paths]
    lib = _ensure_lib()
    if lib is None:
        return None
    for p in paths:
        if not os.path.exists(p):
            raise FileNotFoundError(p)
    h = lib.tl_load("\n".join(paths).encode(), order.encode())
    try:
        err = lib.tl_error(h).decode()
        if err:
            raise RuntimeError(f"tripleloader: {err} ({paths})")
        n = lib.tl_n_triples(h)
        flat = np.empty((n, 3), np.int32)
        lib.tl_copy_triples(
            h, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        splits = []
        off = 0
        for i in range(lib.tl_n_files(h)):
            cnt = lib.tl_file_n_triples(h, i)
            splits.append(flat[off : off + cnt])
            off += cnt
        if with_names:
            entities = [
                lib.tl_entity_name(h, i).decode()
                for i in range(lib.tl_n_entities(h))
            ]
            relations = [
                lib.tl_relation_name(h, i).decode()
                for i in range(lib.tl_n_relations(h))
            ]
        else:
            entities = int(lib.tl_n_entities(h))
            relations = int(lib.tl_n_relations(h))
        return splits, entities, relations
    finally:
        lib.tl_free(h)


def greedy_partition(triples, n_entities: int, n_parts: int):
    """Native METIS-lite entity partitioner (native/src/partitioner.cpp):
    bit-identical to `data.greedy_entity_partition`'s Python reference
    (pinned in tests/test_native.py) without its per-entity interpreter
    loop — the path to 1e8-1e9-edge graphs. Returns None when the native
    toolchain is unavailable (caller falls back to Python)."""
    lib = _ensure_lib()
    if lib is None:
        return None
    t = np.ascontiguousarray(np.asarray(triples, np.int32))
    if t.ndim != 2 or t.shape[1] != 3:
        raise ValueError(f"triples must be (N, 3), got {t.shape}")
    out = np.empty(int(n_entities), np.int32)
    rc = lib.skge_greedy_partition(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(t.shape[0]),
        ctypes.c_int32(int(n_entities)),
        ctypes.c_int32(int(n_parts)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc:
        raise ValueError(
            f"skge_greedy_partition failed (code {rc}): check entity ids "
            "are in [0, n_entities)"
        )
    return out
