"""Python bindings for the native shard store (native/shard_reader.cpp).

``.vshard`` is this framework's fixed-record binary store: written once by
preprocessing, read via mmap + parallel memcpy in C++ — the TPU-native
replacement for the reference's single-worker h5py random reads
(SURVEY.md §2c data-loader row). The dataset layer treats a ``.vshard``
video store interchangeably with h5 (data/datasets.py).
"""

from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"VSHARD01"
_DTYPES = {0: np.float32, 1: np.uint8, 2: np.int32}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.uint8): 1, np.dtype(np.int32): 2}

_LIB_SOURCE = Path(__file__).resolve().parent.parent.parent / "native" / "shard_reader.cpp"
_LIB_CACHE = Path(__file__).resolve().parent.parent.parent / "native" / "libshard_reader.so"

_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> Path:
    """Compile the C++ reader once (g++ -O3); cached next to the source.

    Concurrency-safe for multi-process first use (e.g. grain worker
    processes): an fcntl lock serializes the compile, and the output is
    written to a per-pid temp path then os.replace'd — a concurrent dlopen
    can never see a half-written .so."""
    def fresh() -> bool:
        return (
            _LIB_CACHE.exists()
            and _LIB_CACHE.stat().st_mtime >= _LIB_SOURCE.stat().st_mtime
        )

    if fresh() and not force:
        return _LIB_CACHE

    import fcntl
    import os

    lock_path = _LIB_CACHE.with_suffix(".lock")
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if fresh() and not force:  # another process built it meanwhile
                return _LIB_CACHE
            tmp = _LIB_CACHE.with_suffix(f".tmp.{os.getpid()}.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 str(_LIB_SOURCE), "-o", str(tmp)],
                check=True,
            )
            os.replace(tmp, _LIB_CACHE)  # atomic on the same filesystem
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
    return _LIB_CACHE


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_native()))
        lib.sr_open.restype = ctypes.c_void_p
        lib.sr_open.argtypes = [ctypes.c_char_p]
        lib.sr_num_records.restype = ctypes.c_int64
        lib.sr_num_records.argtypes = [ctypes.c_void_p]
        lib.sr_record_bytes.restype = ctypes.c_int64
        lib.sr_record_bytes.argtypes = [ctypes.c_void_p]
        lib.sr_dtype.restype = ctypes.c_int
        lib.sr_dtype.argtypes = [ctypes.c_void_p]
        lib.sr_ndim.restype = ctypes.c_int
        lib.sr_ndim.argtypes = [ctypes.c_void_p]
        lib.sr_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
        lib.sr_gather.restype = ctypes.c_int
        lib.sr_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.sr_prefetch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.sr_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class ShardWriter:
    """Append fixed-shape records to a .vshard file (header patched on close)."""

    def __init__(self, path: str, record_shape: Tuple[int, ...], dtype=np.float32):
        assert len(record_shape) <= 8
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.record_shape = tuple(int(d) for d in record_shape)
        self.dtype = np.dtype(dtype)
        self.record_bytes = int(np.prod(self.record_shape)) * self.dtype.itemsize
        self.count = 0
        self._f = open(self.path, "wb")
        self._write_header()

    def _write_header(self):
        dims = list(self.record_shape) + [0] * (8 - len(self.record_shape))
        hdr = struct.pack(
            "<8sIIII8I2I",
            _MAGIC, self.count, self.record_bytes, len(self.record_shape),
            _DTYPE_CODES[self.dtype], *dims, 0, 0,
        )
        assert len(hdr) == 64, len(hdr)
        self._f.seek(0)
        self._f.write(hdr)
        self._f.seek(0, 2)

    def append(self, record: np.ndarray) -> None:
        record = np.ascontiguousarray(record, dtype=self.dtype)
        assert record.shape == self.record_shape, (record.shape, self.record_shape)
        self._f.write(record.tobytes())
        self.count += 1

    def close(self) -> None:
        self._write_header()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class ShardReader:
    """mmap-backed random-access reader with threaded gather + prefetch."""

    def __init__(self, path: str, num_threads: int = 8):
        self._lib = _load_lib()
        self._h = self._lib.sr_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open shard {path}")
        self.num_threads = num_threads
        self.num_records = int(self._lib.sr_num_records(self._h))
        self.record_bytes = int(self._lib.sr_record_bytes(self._h))
        self.dtype = np.dtype(_DTYPES[self._lib.sr_dtype(self._h)])
        ndim = self._lib.sr_ndim(self._h)
        dims = (ctypes.c_uint32 * ndim)()
        self._lib.sr_dims(self._h, dims)
        self.record_shape = tuple(int(d) for d in dims)

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), *self.record_shape), dtype=self.dtype)
        rc = self._lib.sr_gather(
            self._h,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.c_void_p),
            self.num_threads,
        )
        if rc != 0:
            raise IndexError(f"shard gather failed (index out of range?) rc={rc}")
        return out

    def prefetch(self, indices: Sequence[int]) -> None:
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        self._lib.sr_prefetch(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx)
        )

    def close(self) -> None:
        if self._h:
            self._lib.sr_close(self._h)
            self._h = None

    def __len__(self) -> int:
        return self.num_records

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def h5_to_vshard(h5_path: str, out_path: str, dataset: str = "videos") -> int:
    """Convert a reference-format h5 store to .vshard (compat boundary)."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        ds = f[dataset]
        with ShardWriter(out_path, ds.shape[1:], ds.dtype) as w:
            for i in range(ds.shape[0]):
                w.append(ds[i])
            return w.count
