"""ctypes binding for the native prefetching dataset loader.

Wraps native/lib/libeao_loader.so (threaded libpng/libjpeg decode + ordered
prefetch ring — the runtime-native replacement for the reference driver's
synchronous cv::imread loop, Examples/Monocular/mono_tum.cc:68-109). Falls
back to cv2 when the shared library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "lib", "libeao_loader.so"
)


def _build_lib(path: str) -> bool:
    """One-shot local build (g++ + system libpng/libjpeg, native/build.sh).
    The .so is a build artifact, not a committed binary — first import
    compiles it in ~1 s; failure of any step just means cv2 fallback."""
    # normpath: the lib/ dir may not exist yet, and exists() refuses paths
    # with missing intermediate components
    script = os.path.normpath(
        os.path.join(os.path.dirname(path), "..", "build.sh"))
    if not os.path.exists(script):
        return False
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        return False
    try:
        subprocess.run(["sh", script], check=True, capture_output=True,
                       timeout=120)
    except Exception:
        return False
    return os.path.exists(path)


def _load_lib() -> Optional[ctypes.CDLL]:
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path) and not _build_lib(path):
        return None
    lib = ctypes.CDLL(path)
    lib.eao_loader_open.restype = ctypes.c_void_p
    lib.eao_loader_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.eao_loader_next.restype = ctypes.c_int
    lib.eao_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.eao_loader_close.restype = None
    lib.eao_loader_close.argtypes = [ctypes.c_void_p]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


class SequenceLoader:
    """Ordered iterator of (index, timestamp, gray float32 [H, W]) frames
    with background decode; context-manager owned native handle."""

    def __init__(self, directory: str, filenames: Sequence[str],
                 timestamps: Sequence[float], width: int, height: int,
                 n_threads: int = 2, ring: int = 8, force_fallback: bool = False):
        self.dir = directory
        self.files = list(filenames)
        self.stamps = [float(t) for t in timestamps]
        self.w, self.h = width, height
        self._handle = None
        self._use_native = _LIB is not None and not force_fallback
        if self._use_native:
            arr = (ctypes.c_char_p * len(self.files))(
                *[f.encode() for f in self.files]
            )
            st = (ctypes.c_double * len(self.stamps))(*self.stamps)
            self._handle = _LIB.eao_loader_open(
                directory.encode(), arr, st, len(self.files),
                width, height, n_threads, ring,
            )

    def __iter__(self) -> Iterator[Tuple[int, float, np.ndarray]]:
        if self._use_native:
            buf = np.empty((self.h, self.w), np.float32)
            stamp = ctypes.c_double()
            while True:
                rc = _LIB.eao_loader_next(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    ctypes.byref(stamp),
                )
                if rc == -1:
                    return
                if rc == -2:   # unreadable frame: skip, like the reference
                    continue
                yield rc, stamp.value, buf.copy()
        else:
            import cv2

            for i, (f, t) in enumerate(zip(self.files, self.stamps)):
                img = cv2.imread(os.path.join(self.dir, f), cv2.IMREAD_GRAYSCALE)
                if img is None:
                    continue
                if img.shape != (self.h, self.w):
                    img = cv2.resize(img, (self.w, self.h),
                                     interpolation=cv2.INTER_NEAREST)
                yield i, t, img.astype(np.float32)

    def close(self):
        if self._handle is not None:
            _LIB.eao_loader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
