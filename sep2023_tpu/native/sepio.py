"""ctypes binding for the native shot-I/O library (libsepio.so).

Auto-builds with the in-tree Makefile on first use if g++ is available;
`io.py` silently falls back to the NumPy path when the library cannot be
built or loaded.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsepio.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.sepio_read_shots.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, f32p, ctypes.c_int]
    lib.sepio_read_shots.restype = ctypes.c_int
    lib.sepio_write_shots.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, f32p, ctypes.c_int]
    lib.sepio_write_shots.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_shots(data_dir: str, shot_ids: Sequence[int], nrec: int,
               nt: int, n_threads: int = 0) -> np.ndarray:
    lib = _load()
    ids = np.asarray(shot_ids, dtype=np.int64)
    out = np.empty((len(ids), 4, nrec, nt), dtype=np.float32)
    rc = lib.sepio_read_shots(
        data_dir.encode(), ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ids), nrec, nt,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        raise IOError(f"sepio_read_shots failed (rc={rc}) in {data_dir}")
    return out


def write_shots(data_dir: str, data: np.ndarray,
                shot_ids: Sequence[int], n_threads: int = 0) -> None:
    lib = _load()
    os.makedirs(data_dir, exist_ok=True)
    ids = np.asarray(shot_ids, dtype=np.int64)
    arr = np.ascontiguousarray(data, dtype=np.float32)
    S, C, nrec, nt = arr.shape
    assert C == 4 and S == len(ids)
    rc = lib.sepio_write_shots(
        data_dir.encode(), ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        S, nrec, nt,
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        raise IOError(f"sepio_write_shots failed (rc={rc}) in {data_dir}")
