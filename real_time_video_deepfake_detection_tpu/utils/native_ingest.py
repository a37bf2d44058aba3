"""ctypes bindings + lazy build for the C++ ingest data plane
(native/ingest.cpp): JPEG decode (libjpeg) and bit-exact cv2 INTER_LINEAR
resize on the host, with a threaded batch API. Falls back to cv2 when the
toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "ingest.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, ".build")

# Must match ingest_abi_version() in native/ingest.cpp. Bumped together
# whenever an exported signature changes. The version is part of the .so
# FILENAME (not just a post-load check) because a stale cached build can
# carry a newer-than-source mtime (rsync/archive restores, shared build
# caches) and dlopen caches by path — calling an old-ABI library through
# the new bindings would corrupt argument marshalling (segfault).
_ABI_VERSION = 4
_SO = os.path.join(_BUILD_DIR, f"libingest_v{_ABI_VERSION}.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    # -ffp-contract=off: FMA contraction would flip 1-LSB rounding in the
    # float32 CLAHE interpolation vs numpy's uncontracted arithmetic.
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-std=c++17", _SRC, "-o", _SO, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
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
            lib.ingest_abi_version.restype = ctypes.c_int
            abi_ok = lib.ingest_abi_version() == _ABI_VERSION
        except AttributeError:
            abi_ok = False  # symbol missing: not a library we built
        if not abi_ok:
            # A file at the versioned path that doesn't report the matching
            # ABI was not produced by _build (hand-copied/corrupt). Refuse
            # it — callers fall back to the cv2 path.
            return None
        lib.ingest_decode.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.ingest_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ingest_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.ingest_decode_resize.restype = ctypes.c_int
        lib.ingest_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.ingest_decode_resize_batch.restype = ctypes.c_int
        lib.ingest_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ingest_resize_u8.restype = ctypes.c_int
        lib.ingest_resize_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.ingest_detect_heuristic.restype = ctypes.c_int
        lib.ingest_detect_heuristic.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.ingest_clahe_u8.restype = ctypes.c_int
        lib.ingest_clahe_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.c_void_p]
        lib.ingest_bgr2lab.restype = ctypes.c_int
        lib.ingest_bgr2lab.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.ingest_lab2bgr.restype = ctypes.c_int
        lib.ingest_lab2bgr.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
        lib.ingest_decode_coefs_batch.restype = ctypes.c_int
        lib.ingest_decode_coefs_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.ingest_decode_raw420_batch.restype = ctypes.c_int
        lib.ingest_decode_raw420_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.ingest_prep_frame.restype = ctypes.c_int
        lib.ingest_prep_frame.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> BGR u8 array (native), None on failure/unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    buf = lib.ingest_decode(data, len(data), 0,
                            ctypes.byref(h), ctypes.byref(w))
    if not buf:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.ingest_free(buf)
    return arr


def decode_resize(data: bytes, dh: int = 256, dw: int = 256) -> Optional[np.ndarray]:
    """JPEG bytes -> (dh, dw, 3) BGR u8 analysis frame, full-decode then
    bit-exact cv2 resize — one native call, no intermediate copies to
    Python."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((dh, dw, 3), np.uint8)
    rc = lib.ingest_decode_resize(
        data, len(data), out.ctypes.data, dh, dw, None, None)
    return out if rc == 0 else None


def decode_resize_batch(datas: List[bytes], dh: int = 256,
                        dw: int = 256, n_threads: int = 0,
                        fast: bool = False, with_dims: bool = False):
    """List of JPEG byte strings -> ((N, dh, dw, 3) u8, ok bool array).

    fast=True uses libjpeg DCT-scaled decode (smallest M/8 scale that keeps
    the decoded image >= 2x the target) before the bit-exact cv2 resize —
    ~2-4x cheaper on large captures, but pixel values are no longer
    bit-identical to the full-decode pipeline (docs/DESIGN.md "Known
    numeric deviations"). Default off.

    with_dims=True additionally returns the TRUE pre-scaling source dims as
    an (N, 2) int32 (h, w) array — zeros for failed decodes. The serving
    layer uses these to keep face boxes in client coordinate space without
    any extra per-request host decode."""
    lib = get_lib()
    if lib is None:
        return (None, None, None) if with_dims else (None, None)
    n = len(datas)
    out = np.empty((n, dh, dw, 3), np.uint8)
    ok = (ctypes.c_int * n)()
    dims = np.zeros((n, 2), np.int32)
    arr_p = (ctypes.c_char_p * n)(*datas)
    arr_l = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    lib.ingest_decode_resize_batch(
        arr_p, arr_l, out.ctypes.data, dh, dw, n, n_threads, int(fast), ok,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    ok_arr = np.ctypeslib.as_array(ok).astype(bool).copy()
    if with_dims:
        return out, ok_arr, dims
    return out, ok_arr


def decode_coefs_batch(datas: List[bytes], h: int, w: int,
                       n_threads: int = 0, pad_to: int = 0):
    """Entropy-only ("coef" wire plane) batch decode: Huffman decode on the
    host, NOTHING else — dequant/IDCT/upsample/color run on device
    (ops/jpeg_decode.py, bit-exact libjpeg integer math).

    Returns (coef_y (N, yb, 64) i16, coef_c (N, 2, yb//4, 64) i16,
    qtab (N, 2, 64) u16 natural order, ok bool (N,)) or None when the
    native library is unavailable. ok[i] is False for entries that are not
    8-bit baseline/progressive YCbCr 4:2:0 at exactly (h, w) — the caller
    falls back to the full-decode path for those. h, w must divide by 16.

    pad_to > len(datas) allocates the output arrays with that leading dim
    (rows beyond len(datas) uninitialized; qtab rows zeroed) so the serving
    tick can decode straight into its padded bucket batch, zero copies."""
    lib = get_lib()
    if lib is None or h % 16 or w % 16:
        return None
    n = len(datas)
    rows = max(n, pad_to)
    yb = (h // 8) * (w // 8)
    coef_y = np.empty((rows, yb, 64), np.int16)
    coef_c = np.empty((rows, 2, yb // 4, 64), np.int16)
    qtab = np.zeros((rows, 2, 64), np.uint16)
    ok = (ctypes.c_int * n)()
    arr_p = (ctypes.c_char_p * n)(*datas)
    arr_l = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    lib.ingest_decode_coefs_batch(
        arr_p, arr_l, h, w, coef_y.ctypes.data, coef_c.ctypes.data,
        qtab.ctypes.data, n, n_threads, ok)
    return coef_y, coef_c, qtab, np.ctypeslib.as_array(ok).astype(bool).copy()


def decode_raw420_batch(datas: List[bytes], h: int, w: int,
                        n_threads: int = 0, pad_to: int = 0):
    """Raw 4:2:0 ("ycbcr420" wire plane) batch decode: entropy decode +
    IDCT on the host, but upsample/color-convert on device — the wire
    carries 1.5 B/px instead of BGR's 3 B/px (halves host->device traffic).

    Returns (y (N, h, w) u8, c (N, 2, h//2, w//2) u8 Cb-then-Cr, ok bool)
    or None when the native library is unavailable. Eligibility and
    fallback semantics match decode_coefs_batch (incl. pad_to)."""
    lib = get_lib()
    if lib is None or h % 16 or w % 16:
        return None
    n = len(datas)
    rows = max(n, pad_to)
    y = np.empty((rows, h, w), np.uint8)
    c = np.empty((rows, 2, h // 2, w // 2), np.uint8)
    ok = (ctypes.c_int * n)()
    arr_p = (ctypes.c_char_p * n)(*datas)
    arr_l = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    lib.ingest_decode_raw420_batch(
        arr_p, arr_l, h, w, y.ctypes.data, c.ctypes.data, n, n_threads, ok)
    return y, c, np.ctypeslib.as_array(ok).astype(bool).copy()


def detect_heuristic_native(frame_bgr: np.ndarray):
    """Native skin-heuristic face detector; exact port of
    models/heuristic_face.py. Returns [(x,y,w,h)] or []. None = unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(frame_bgr)
    box = (ctypes.c_int * 4)()
    rc = lib.ingest_detect_heuristic(
        src.ctypes.data, src.shape[0], src.shape[1], box)
    return [tuple(box)] if rc == 1 else []


def clahe_u8_native(src: np.ndarray, clip_limit: float = 2.0,
                    tiles: int = 8) -> Optional[np.ndarray]:
    """Native CLAHE (exact port of ops/clahe.py clahe_u8_numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    out = np.empty_like(src)
    lib.ingest_clahe_u8(src.ctypes.data, src.shape[0], src.shape[1],
                        clip_limit, tiles, out.ctypes.data)
    return out


def bgr2lab_native(bgr: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(bgr)
    out = np.empty_like(src)
    lib.ingest_bgr2lab(src.ctypes.data, src.shape[0] * src.shape[1],
                       out.ctypes.data)
    return out


def lab2bgr_native(lab: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(lab)
    out = np.empty_like(src)
    lib.ingest_lab2bgr(src.ctypes.data, src.shape[0] * src.shape[1],
                       out.ctypes.data)
    return out


def prep_frame(data: bytes, analysis_hw=(256, 256), align: int = 160):
    """Full per-request serving prep in ONE GIL-free native call:
    decode -> analysis resize -> heuristic detect -> CLAHE -> align.

    Returns (frame256 u8 BGR, aligned u8 RGB or None, box or None), or None
    when the native library is unavailable or the bytes are not decodable
    JPEG (caller falls back to the Python path)."""
    lib = get_lib()
    if lib is None:
        return None
    ah, aw = analysis_hw
    frame = np.empty((ah, aw, 3), np.uint8)
    aligned = np.empty((align, align, 3), np.uint8)
    box = (ctypes.c_int * 4)()
    rc = lib.ingest_prep_frame(data, len(data), frame.ctypes.data,
                               ah, aw, aligned.ctypes.data, align, box)
    if rc < 0:
        return None
    if rc == 0:
        return frame, None, None
    return frame, aligned, tuple(box)


def resize_u8(src: np.ndarray, dh: int, dw: int) -> Optional[np.ndarray]:
    """Native bit-exact cv2 INTER_LINEAR resize of an HWC u8 array."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    out = np.empty((dh, dw, 3), np.uint8)
    lib.ingest_resize_u8(src.ctypes.data, src.shape[0], src.shape[1],
                         out.ctypes.data, dh, dw)
    return out
