"""ctypes bindings + lazy build for the native Haar evaluator
(native/haar.cpp).  The XML is parsed in Python (models/haar_cascade.py);
only the packed stump arrays cross the boundary.  Raw windows come back and
are grouped by the shared Python groupRectangles, so the native and numpy
paths return identical boxes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "haar.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, ".build")

# Must match haar_abi_version() in native/haar.cpp; part of the filename so
# a stale cached build (newer-than-source mtime after an archive restore)
# can never be dlopen'd against mismatched bindings (see native_ingest.py).
_ABI_VERSION = 1
_SO = os.path.join(_BUILD_DIR, f"libhaar_v{_ABI_VERSION}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        try:
            lib.haar_abi_version.restype = ctypes.c_int
            abi_ok = lib.haar_abi_version() == _ABI_VERSION
        except AttributeError:
            abi_ok = False
        if not abi_ok:
            return None  # not a library we built: fall back to numpy path
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.haar_create.restype = ctypes.c_void_p
        lib.haar_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p, f32p, i32p,
            f32p, f32p, f32p, f32p]
        lib.haar_destroy.argtypes = [ctypes.c_void_p]
        lib.haar_detect_raw.restype = ctypes.c_int
        lib.haar_detect_raw.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int]
        _lib = lib
        return _lib


class NativeHaar:
    """Owns the C++-side cascade handle for one parsed HaarCascade."""

    _MAX_RAW = 8192  # raw (pre-grouping) window capacity

    def __init__(self, cascade) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native haar library unavailable")
        self._lib = lib
        ntrees = np.asarray([s.node_thresh.size for s in cascade.stages],
                            np.int32)
        st_th = np.asarray([s.threshold for s in cascade.stages], np.float32)
        rects = np.ascontiguousarray(
            np.concatenate([s.rects for s in cascade.stages]), np.int32)
        weights = np.ascontiguousarray(
            np.concatenate([s.weights for s in cascade.stages]), np.float32)
        node_th = np.concatenate([s.node_thresh for s in cascade.stages])
        leaf0 = np.concatenate([s.leaf0 for s in cascade.stages])
        leaf1 = np.concatenate([s.leaf1 for s in cascade.stages])
        self._h = lib.haar_create(
            cascade.win_w, cascade.win_h, len(cascade.stages),
            ntrees, st_th, rects,
            weights, np.ascontiguousarray(node_th, np.float32),
            np.ascontiguousarray(leaf0, np.float32),
            np.ascontiguousarray(leaf1, np.float32))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.haar_destroy(self._h)
        except Exception:
            pass

    def detect_raw(self, gray: np.ndarray, scale_factor: float = 1.1,
                   min_size: Tuple[int, int] = (30, 30),
                   max_size: Optional[Tuple[int, int]] = None,
                   ) -> List[Tuple[int, int, int, int]]:
        gray = np.ascontiguousarray(gray, np.uint8)
        h, w = gray.shape
        cap = self._MAX_RAW
        while True:
            out = np.zeros(cap * 4, np.int32)
            n = self._lib.haar_detect_raw(
                self._h, gray, h, w, float(scale_factor),
                int(min_size[0]), int(min_size[1]),
                int(max_size[0]) if max_size else w,
                int(max_size[1]) if max_size else h,
                out, out.size)
            if n <= cap:
                return [tuple(int(v) for v in out[i * 4:i * 4 + 4])
                        for i in range(n)]
            # returned total exceeds the buffer: retry sized to fit so the
            # native rung stays decision-identical to the numpy evaluator
            cap = n
