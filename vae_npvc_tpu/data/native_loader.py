"""ctypes bridge to the C++ ark batch loader (native/ark_loader.cc).

Builds the shared library with g++ on first use (cached beside the source;
rebuilt when the source is newer). Handles FM plus all three Kaldi
compressed formats (CM/CM2/CM3, decoded bit-identically to kaldi_io); falls
back cleanly when compilation fails or the scp points at double matrices or
range rxspecifiers — callers check :func:`NativeArkLoader.open` for ``None``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent.parent / "native" / "ark_loader.cc"
_LIB = _SRC.with_suffix(".so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not _LIB.exists()
                    or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
                # compile to a per-process temp path and rename into place:
                # concurrent multi-host processes building the shared .so
                # directly would race, and a peer could CDLL a half-written
                # library (os.rename is atomic within the filesystem)
                import os
                tmp = _LIB.with_suffix(f".so.tmp{os.getpid()}")
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", str(_SRC), "-o", str(tmp)],
                    check=True, capture_output=True)
                os.rename(tmp, _LIB)
            lib = ctypes.CDLL(str(_LIB))
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
            return None
        lib.loader_open.restype = ctypes.c_void_p
        lib.loader_open.argtypes = [ctypes.c_char_p]
        lib.loader_num_utts.restype = ctypes.c_long
        lib.loader_num_utts.argtypes = [ctypes.c_void_p]
        lib.loader_feat_dim.restype = ctypes.c_int
        lib.loader_feat_dim.argtypes = [ctypes.c_void_p]
        lib.loader_num_frames.restype = ctypes.c_long
        lib.loader_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_long]
        lib.loader_load_batch.restype = ctypes.c_int
        lib.loader_load_batch.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
        lib.loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeArkLoader:
    """Windowed batch reads over one feats.scp; thread-parallel in C++."""

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib
        self.num_utts = lib.loader_num_utts(handle)
        self.feat_dim = lib.loader_feat_dim(handle)

    @classmethod
    def open(cls, feats_scp):
        """Returns a loader or None (unsupported format / no toolchain)."""
        lib = _load_lib()
        if lib is None:
            return None
        h = lib.loader_open(str(feats_scp).encode())
        if not h:
            return None
        return cls(h, lib)

    def num_frames(self, idx):
        return self._lib.loader_num_frames(self._h, int(idx))

    def load_batch(self, indices, starts, crop, out=None, nthreads=8):
        """Fill (n, crop, dim) float32; rows past each utterance end are 0."""
        indices = np.ascontiguousarray(indices, np.int64)
        starts = np.ascontiguousarray(starts, np.int64)
        n = len(indices)
        if out is None:
            out = np.empty((n, crop, self.feat_dim), np.float32)
        rc = self._lib.loader_load_batch(self._h, indices, starts, n, crop,
                                         out, nthreads)
        if rc != 0:
            raise IOError(f"native ark loader failed with code {rc}")
        return out

    def close(self):
        if self._h:
            self._lib.loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
