"""Disk spill tier for the host out-of-core driver.

Role analog: ``Core/Spiller.h:87`` / ``Core/SpillHandler.h`` —
partition-wise spill files of compressed blocks with background IO.
The engine's jitted programs never spill mid-flight; the HOST driver
(runtime/outofcore.py) stages partition buffers, and when
``Settings.spill_dir`` is set those buffers go through the native
spiller (``native/spiller.cpp``: zlib chunks, CRC-checked, background
writer pool) instead of pinning host RAM.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "spiller.cpp")
_SO = os.path.join(_NATIVE_DIR, "libtflspill.so")

_lock = threading.Lock()
_lib = None


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _SO, "-lz"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.spl_open.restype = ctypes.c_void_p
        lib.spl_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.spl_write.restype = ctypes.c_int
        lib.spl_write.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int]
        lib.spl_sync.restype = ctypes.c_int
        lib.spl_sync.argtypes = [ctypes.c_void_p]
        lib.spl_chunk_raw_size.restype = ctypes.c_int64
        lib.spl_chunk_raw_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.spl_read.restype = ctypes.c_int64
        lib.spl_read.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.spl_stats.restype = None
        lib.spl_stats.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint64),
                                  ctypes.POINTER(ctypes.c_uint64)]
        lib.spl_close.restype = None
        lib.spl_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return lib


class Spiller:
    """One spill scope (a query's restore round).  Arrays spill as
    compressed chunks; metadata (dtype/shape) stays host-side here."""

    def __init__(self, directory: str, nthreads: int = 0):
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._lib = get_lib()
        self._h = self._lib.spl_open(directory.encode(), nthreads)
        if not self._h:
            raise IOError(f"cannot open spill dir {directory}")
        self._meta: Dict[int, Tuple[str, Tuple[int, ...]]] = {}
        self._closed = False

    def spill_array(self, arr: np.ndarray, partition: int = 0) -> int:
        a = np.ascontiguousarray(arr)
        cid = self._lib.spl_write(
            self._h, partition, a.ctypes.data_as(ctypes.c_void_p),
            a.nbytes, 1,
        )
        if cid < 0:
            raise IOError("spill write failed")
        self._meta[cid] = (str(a.dtype), a.shape)
        return cid

    def restore_array(self, chunk_id: int) -> np.ndarray:
        dt, shape = self._meta[chunk_id]
        raw = self._lib.spl_chunk_raw_size(self._h, chunk_id)
        if raw < 0:
            raise IOError(f"spill chunk {chunk_id} failed or corrupt")
        out = np.empty(raw, dtype=np.uint8)
        got = self._lib.spl_read(
            self._h, chunk_id, out.ctypes.data_as(ctypes.c_void_p))
        if got != raw:
            raise IOError(f"spill chunk {chunk_id} corrupt (CRC/size)")
        return out.view(np.dtype(dt)).reshape(shape)

    def sync(self) -> None:
        if self._lib.spl_sync(self._h) != 0:
            raise IOError("background spill write failed")

    def stats(self) -> Tuple[int, int]:
        raw = ctypes.c_uint64()
        comp = ctypes.c_uint64()
        self._lib.spl_stats(self._h, ctypes.byref(raw), ctypes.byref(comp))
        return raw.value, comp.value

    def close(self, remove_files: bool = True) -> None:
        if not self._closed:
            self._lib.spl_close(self._h, 1 if remove_files else 0)
            self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class PartStore:
    """Accumulates per-partition host row buffers for the out-of-core
    driver.  With a spill directory, each part's arrays stream to disk
    through the native spiller (background-compressed) and restore at
    merge time; without one they stay in host RAM (the r1 behavior)."""

    def __init__(self, spill_dir: str = "", nthreads: int = 0):
        self._spiller: Optional[Spiller] = (
            Spiller(spill_dir, nthreads) if spill_dir else None
        )
        self._parts: List = []

    def add(self, names: Tuple[str, ...], arrays: List[np.ndarray],
            partition: int = 0) -> None:
        from .metrics import METRICS

        METRICS.counter("spill_parts_total").inc()
        METRICS.counter("spill_bytes_total").inc(
            sum(int(a.nbytes) for a in arrays if a is not None))
        if self._spiller is not None:
            METRICS.counter("spill_files_total").inc()
        if self._spiller is None:
            self._parts.append((names, arrays))
            return
        cids = [
            None if a is None else self._spiller.spill_array(a, partition)
            for a in arrays
        ]
        self._parts.append((names, cids))

    def parts(self) -> List[Tuple[Tuple[str, ...], List[np.ndarray]]]:
        if self._spiller is None:
            return self._parts
        self._spiller.sync()
        out = []
        for names, cids in self._parts:
            out.append((names, [
                None if c is None else self._spiller.restore_array(c)
                for c in cids
            ]))
        return out

    def stats(self) -> Tuple[int, int]:
        return (0, 0) if self._spiller is None else self._spiller.stats()

    def close(self) -> None:
        if self._spiller is not None:
            self._spiller.close()


__all__ = ["Spiller", "PartStore", "get_lib"]
