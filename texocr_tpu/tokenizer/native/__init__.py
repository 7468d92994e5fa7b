"""ctypes bindings for the native C++ BPE encoder.

Compiles bpe_encoder.cpp with g++ on first use (cached next to the source);
falls back to the pure-Python encoder if the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "bpe_encoder.cpp")
_SO = os.path.join(_DIR, "libbpe_encoder.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_library():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_create.argtypes = [i32p, i32p, i32p, ctypes.c_int32]
            lib.bpe_destroy.argtypes = [ctypes.c_void_p]
            lib.bpe_encode_many.restype = ctypes.c_int32
            lib.bpe_encode_many.argtypes = [
                ctypes.c_void_p, i32p, i32p, ctypes.c_int32, i32p, i32p,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
            _lib = None
        return _lib


def native_available() -> bool:
    return _load_library() is not None


class NativeBPEEncoder:
    """Holds a compiled merge table; encodes batches of pre-split byte id
    lists with semantics identical to the Python merge loop."""

    def __init__(self, merges: Dict[Tuple[int, int], int]):
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native BPE encoder unavailable")
        self._lib = lib
        n = len(merges)
        a = np.fromiter((p[0] for p in merges), dtype=np.int32, count=n)
        b = np.fromiter((p[1] for p in merges), dtype=np.int32, count=n)
        ids = np.fromiter(merges.values(), dtype=np.int32, count=n)
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._handle = lib.bpe_create(
            a.ctypes.data_as(i32p), b.ctypes.data_as(i32p),
            ids.ctypes.data_as(i32p), n,
        )

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.bpe_destroy(self._handle)
            self._handle = None

    def encode_concat(
        self, splits: Sequence[bytes]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode all splits in one FFI call.

        Returns (ids, offsets): ids is the concatenated int32 token stream,
        offsets is the (n_splits + 1,) prefix-offset array — slice
        ids[offsets[i]:offsets[j]] for the tokens of splits i..j-1.
        """
        if not splits:
            return np.zeros(0, np.int32), np.zeros(1, np.int32)
        lens = np.fromiter(map(len, splits), dtype=np.int32, count=len(splits))
        offsets = np.zeros(len(splits) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        ids_in = np.frombuffer(b"".join(splits), dtype=np.uint8).astype(np.int32)
        ids_out = np.empty(max(int(offsets[-1]), 1), dtype=np.int32)
        out_offsets = np.empty(len(splits) + 1, dtype=np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        if ids_in.size == 0:
            ids_in = np.zeros(1, dtype=np.int32)
        self._lib.bpe_encode_many(
            self._handle,
            ids_in.ctypes.data_as(i32p),
            offsets.ctypes.data_as(i32p),
            len(splits),
            ids_out.ctypes.data_as(i32p),
            out_offsets.ctypes.data_as(i32p),
        )
        return ids_out, out_offsets

    def encode_splits(self, splits: Sequence[bytes]) -> List[List[int]]:
        """Per-split token lists (convenience wrapper over encode_concat)."""
        ids, offsets = self.encode_concat(splits)
        return [
            ids[offsets[i] : offsets[i + 1]].tolist() for i in range(len(splits))
        ]
