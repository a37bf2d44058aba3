"""Host-side analysis-frame resize with a preference ladder.

Per-request frames arrive at arbitrary resolutions, so the resize to the
256x256 analysis canvas happens on host (dynamic shapes don't batch).
Ladder: native C++ (bit-exact cv2 semantics, no OpenCV dependency) -> cv2 ->
jnp eager (always available, pays a device dispatch per request)."""

from __future__ import annotations

import numpy as np


def resize_analysis(frame_bgr: np.ndarray, dh: int = 256, dw: int = 256) -> np.ndarray:
    from . import native_ingest as ni
    out = None
    if ni.get_lib() is not None:
        try:
            out = ni.resize_u8(frame_bgr, dh, dw)
        except Exception:
            out = None
    if out is None:
        try:
            import cv2
            out = cv2.resize(frame_bgr, (dw, dh), interpolation=cv2.INTER_LINEAR)
        except Exception:
            out = None
    if out is None:
        import jax.numpy as jnp
        from ..ops.resize import resize_bilinear_u8_cv2
        out = np.asarray(resize_bilinear_u8_cv2(jnp.asarray(frame_bgr), dh, dw))
    return out
