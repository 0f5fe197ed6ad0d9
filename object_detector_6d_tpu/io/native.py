"""ctypes bindings for the native C++ codecs (native/odc_native.cpp).

The library is built lazily with g++ on first use and cached next to the
source; every entry point has a pure-Python fallback (io/yaml_store.py,
io/ply.py), so the framework works without a toolchain — the native path
is the production fast path for large template banks and meshes.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "odc_native.cpp"
_LIB = _NATIVE_DIR / "libodc_native.so"
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-lz", "-o", str(_LIB)],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _failed = True
            return None
        lib.odc_store_open.restype = ctypes.c_void_p
        lib.odc_store_open.argtypes = [ctypes.c_char_p]
        lib.odc_store_counts.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.odc_store_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.odc_store_close.argtypes = [ctypes.c_void_p]
        lib.odc_ply_open.restype = ctypes.c_void_p
        lib.odc_ply_open.argtypes = [ctypes.c_char_p]
        lib.odc_ply_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.odc_ply_fill.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.odc_ply_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def read_class_native(path: str):
    """Native templates_%s.yml.gz reader; returns the same tuple as
    yaml_store.read_class or None if the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.odc_store_open(path.encode())
    if not h:
        return None
    try:
        n_meta = ctypes.c_int64()
        n_feats = ctypes.c_int64()
        levels = ctypes.c_int()
        n_mods = ctypes.c_int()
        if lib.odc_store_counts(h, n_meta, n_feats, levels, n_mods) != 0:
            return None
        meta = np.zeros((n_meta.value, 5), np.int32)
        feats = np.zeros((n_feats.value, 5), np.int32)
        cid = ctypes.create_string_buffer(256)
        mods = ctypes.create_string_buffer(512)
        lib.odc_store_fill(
            h,
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            feats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cid,
            256,
            mods,
            512,
        )
    finally:
        lib.odc_store_close(h)

    from object_detector_6d_tpu.quant.features import Feature, Template

    modalities = mods.value.decode().split(",") if mods.value else []
    n_tids = int(meta[:, 0].max()) + 1 if len(meta) else 0
    n_slots = int(meta[:, 1].max()) + 1 if len(meta) else 0
    tps: List[List[Template]] = [[None] * n_slots for _ in range(n_tids)]
    for tid, slot, w, hgt, lvl in meta:
        tps[tid][slot] = Template(int(w), int(hgt), int(lvl), [])
    for tid, slot, x, y, lbl in feats:
        tps[tid][slot].features.append(Feature(int(x), int(y), int(lbl)))
    return cid.value.decode(), modalities, int(levels.value), tps


def load_ply_native(path: str) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    h = lib.odc_ply_open(path.encode())
    if not h:
        return None
    try:
        n = ctypes.c_int64()
        n_cols = ctypes.c_int()
        if lib.odc_ply_info(h, n, n_cols) != 0:
            return None
        out = np.zeros((n.value, n_cols.value), np.float32)
        lib.odc_ply_fill(h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    finally:
        lib.odc_ply_close(h)
