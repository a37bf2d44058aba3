"""Face detection frontend with the reference's detector ladder.

Reference behavior (face_detection.py:37-123): OpenCV-DNN SSD (ResNet-10,
300x300) when its caffemodel weights exist, else Haar cascade; exceptions
fall through, then to an empty list.

DESIGN DECISION (SURVEY.md §2.9 "Haar cascade on TPU ... decide in design"):
cv2 5.0 removed BOTH reference backends — cv2.dnn.readNetFromCaffe and
cv2.CascadeClassifier — so neither can serve as a fallback through cv2
anymore. The ladder here is:

  1. primary: SSD-Res10 via the Caffe->JAX compiler (models/ssd_res10.py),
     batched + jitted on TPU, when the user-supplied caffemodel exists
  2. cv2 Haar, attempted only for environments that still ship it
  3. from-scratch Haar evaluator (models/haar_cascade.py + native/haar.cpp)
     reading the standard frontalface XML that distro packages still ship —
     restores the reference snapshot's effective detector on cv2 5.0
  4. heuristic skin-region proposal (models/heuristic_face.py) so the face
     path stays functional with zero detector artifacts at all
  5. empty list

Same contract as the reference: list of (x, y, w, h) int tuples.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

Box = Tuple[int, int, int, int]

_haar = None


def _get_haar():
    global _haar
    if _haar is None:
        import cv2
        _haar = cv2.CascadeClassifier(
            cv2.data.haarcascades + "haarcascade_frontalface_default.xml")
    return _haar


def haar_available() -> bool:
    """Whether this cv2 still ships the Haar backend (cv2 5.0 removed it)."""
    try:
        import cv2
        c = cv2.CascadeClassifier(
            cv2.data.haarcascades + "haarcascade_frontalface_default.xml")
        return not c.empty()
    except Exception:
        return False


def detect_haar(frame_bgr: np.ndarray) -> List[Box]:
    """Haar fallback with the reference's parameters
    (face_detection.py:108-123)."""
    import cv2
    if frame_bgr.ndim == 3:
        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
    else:
        gray = frame_bgr
    faces = _get_haar().detectMultiScale(
        gray, scaleFactor=1.1, minNeighbors=5, minSize=(30, 30),
        flags=cv2.CASCADE_SCALE_IMAGE)
    return [(int(x), int(y), int(w), int(h)) for (x, y, w, h) in faces]


class FaceDetector:
    """Pluggable detector matching `detect_bounding_box` semantics
    (face_detection.py:37-68): guards tiny/invalid frames; the selected
    backend's answer is final (including "no faces"), and — like the
    reference — only an EXCEPTION falls through to the next rung.

    `backend`: "auto" resolves down the ladder in the module docstring;
    "ssd" / "haar" / "haar_native" / "heuristic" pin a rung (exceptions
    still degrade downward so serving never dies on a detector)."""

    _LADDER = ("ssd", "haar", "haar_native", "heuristic")

    def __init__(self, ssd_weights_path: Optional[str] = None,
                 confidence_threshold: float = 0.5, min_face_px: int = 20,
                 enable_heuristic: bool = True, backend: str = "auto"):
        self.confidence_threshold = confidence_threshold
        self.min_face_px = min_face_px
        self.enable_heuristic = enable_heuristic
        self._ssd = None
        if ssd_weights_path and os.path.exists(ssd_weights_path):
            from ..models.ssd_res10 import SSDRes10
            self._ssd = SSDRes10.from_caffemodel(ssd_weights_path)
        self._ok = {r: True for r in self._LADDER}
        self._ok["heuristic"] = enable_heuristic
        self._probed: dict = {}
        if backend != "auto":
            if backend not in self._LADDER:
                raise ValueError(f"unknown face backend {backend!r}")
            # pin: everything above the requested rung is disabled
            for r in self._LADDER[:self._LADDER.index(backend)]:
                self._ok[r] = False
            # A pinned rung that is unavailable at construction would
            # silently resolve DOWN the ladder — serving would then run a
            # different detector than the operator explicitly requested
            # with --face-backend. Surface that loudly here.
            if not self._available(backend):
                import warnings
                warnings.warn(
                    f"requested face backend {backend!r} is unavailable "
                    f"(missing weights/XML/toolchain); the ladder degrades "
                    f"to {self.backend!r}", RuntimeWarning, stacklevel=2)

    def _available(self, rung: str) -> bool:
        """Availability probes run ONCE and are cached both ways (the cv2
        probe re-parses the cascade XML — far too slow per frame)."""
        if not self._ok[rung]:
            return False
        if rung == "ssd":
            return self._ssd is not None
        cached = self._probed.get(rung)
        if cached is not None:
            return cached
        if rung == "haar":
            ok = haar_available()
        elif rung == "haar_native":
            from ..models.haar_cascade import native_haar_available
            ok = native_haar_available()
        else:
            ok = True
        self._probed[rung] = ok
        return ok

    @property
    def backend(self) -> str:
        for r in self._LADDER:
            if self._available(r):
                return r
        return "none"

    def _detect_with(self, rung: str, frame_bgr: np.ndarray) -> List[Box]:
        if rung == "ssd":
            return self._ssd.detect(
                frame_bgr, self.confidence_threshold, self.min_face_px)
        if rung == "haar":
            return detect_haar(frame_bgr)
        if rung == "haar_native":
            from ..models.haar_cascade import detect_haar_native
            return detect_haar_native(frame_bgr)
        from ..models.heuristic_face import detect_heuristic
        return detect_heuristic(frame_bgr)

    def __call__(self, frame_bgr: np.ndarray) -> List[Box]:
        if frame_bgr is None or getattr(frame_bgr, "size", 0) == 0:
            return []
        if frame_bgr.ndim < 2 or frame_bgr.shape[0] < 30 or frame_bgr.shape[1] < 30:
            return []
        for r in self._LADDER:
            if not self._available(r):
                continue
            try:
                return self._detect_with(r, frame_bgr)
            except Exception:
                # fall through for THIS frame only — the reference retries
                # its primary on the next call (face_detection.py:63-68), so
                # a transient runtime error must not disable a rung forever
                # (availability probes are what's cached, in _available)
                continue
        return []


_default_detector: Optional["FaceDetector"] = None


def detect_bounding_box(frame: np.ndarray,
                        confidence_threshold: float = 0.5) -> List[Box]:
    """Reference module-level API (face_detection.py:37-68): detect faces
    with a shared default detector; list of (x, y, w, h). Lazily constructs
    one FaceDetector (the reference builds its net at import time — an
    anti-pattern this package avoids)."""
    global _default_detector
    if (_default_detector is None
            or _default_detector.confidence_threshold != confidence_threshold):
        _default_detector = FaceDetector(
            confidence_threshold=confidence_threshold)
    return _default_detector(frame)


def extract_face_region(frame: np.ndarray, box: Box, padding: int = 0) -> np.ndarray:
    """(face_detection.py:145-168)."""
    x, y, w, h = box
    x0, y0 = max(0, x - padding), max(0, y - padding)
    x1 = min(frame.shape[1], x + w + padding)
    y1 = min(frame.shape[0], y + h + padding)
    return frame[y0:y1, x0:x1]


def draw_bounding_boxes(frame: np.ndarray, faces: List[Box],
                        color=(0, 255, 0), thickness: int = 2) -> np.ndarray:
    """Annotate a copy of the frame with face boxes (face_detection.py:
    125-143 — unused by the reference serving path but part of its API)."""
    out = frame.copy()
    import cv2
    for (x, y, w, h) in faces:
        cv2.rectangle(out, (x, y), (x + w, y + h), color, thickness)
    return out


def detect_and_extract_faces(frame: np.ndarray, padding: int = 10,
                             detector: Optional[FaceDetector] = None):
    """Detect then crop every face with padding; returns (faces, regions)
    (face_detection.py:170-188)."""
    det = detector or FaceDetector()
    faces = det(frame)
    return faces, [extract_face_region(frame, b, padding) for b in faces]
