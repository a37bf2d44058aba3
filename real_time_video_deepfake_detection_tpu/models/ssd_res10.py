"""SSD ResNet-10 face detector (the reference's primary detector) in JAX.

Wraps the Caffe->JAX compiler (models/caffe_net.py) with the exact
preprocessing and postprocessing of the reference's DNN path
(face_detection.py:71-105): 300x300 INTER_LINEAR resize, mean
(104,177,123), BGR order, confidence > threshold, boxes scaled to the frame,
clamped, minimum side 20 px.

Both artifacts (deploy.prototxt + caffemodel) are user-supplied downloads in
the reference too (face_detection.py:30-34); when absent the pipeline falls
back to Haar exactly like the reference snapshot does.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_u8_cv2
from .caffe_net import CaffeNet

Box = Tuple[int, int, int, int]

_MEAN_BGR = np.array([104.0, 177.0, 123.0], np.float32)


def detect_postprocess_batch(det: jax.Array, frame_h: int, frame_w: int,
                             confidence_threshold: float = 0.5,
                             min_face_px: int = 20):
    """cv2-parity box selection, batched and traceable: DetectionOutput rows
    (B, 1, K, 7) -> the FIRST valid box per frame (the reference server uses
    faces[0], backend_server.py:160; rows are score-sorted so first valid =
    highest-confidence valid — identical to iterating detect()'s list).

    Exactly reproduces face_detection.py:71-105 per row: conf STRICTLY >
    threshold, int() truncation of row*frame_size, clamp to the frame, both
    sides STRICTLY > min_face_px.

    Returns dict: box_xywh i32 (B, 4) [zeros when none], has_face bool (B,),
    n_faces i32 (B,)."""
    rows = det[:, 0]                          # (B, K, 7)
    conf = rows[..., 2]
    finite = jnp.all(jnp.isfinite(rows[..., 3:7]), axis=-1)
    coords = jnp.nan_to_num(rows[..., 3:7], nan=0.0,
                            posinf=2.0, neginf=-2.0)
    # int() truncates toward zero (reference face_detection.py:96-99)
    x1 = (coords[..., 0] * frame_w).astype(jnp.int32)
    y1 = (coords[..., 1] * frame_h).astype(jnp.int32)
    x2 = (coords[..., 2] * frame_w).astype(jnp.int32)
    y2 = (coords[..., 3] * frame_h).astype(jnp.int32)
    x1 = jnp.maximum(0, x1)
    y1 = jnp.maximum(0, y1)
    x2 = jnp.minimum(frame_w, x2)
    y2 = jnp.minimum(frame_h, y2)
    bw = x2 - x1
    bh = y2 - y1
    valid = (finite & (conf > confidence_threshold)
             & (bw > min_face_px) & (bh > min_face_px))
    has_face = jnp.any(valid, axis=1)
    n_faces = jnp.sum(valid, axis=1).astype(jnp.int32)
    first = jnp.argmax(valid, axis=1)         # first True (rows score-sorted)
    take = lambda a: jnp.take_along_axis(a, first[:, None], axis=1)[:, 0]
    box = jnp.stack([take(x1), take(y1), take(bw), take(bh)], axis=1)
    box = jnp.where(has_face[:, None], box, 0)
    return {"box_xywh": box, "has_face": has_face, "n_faces": n_faces}


def make_detect_batch(net: CaffeNet, confidence_threshold: float = 0.5,
                      min_face_px: int = 20):
    """Jitted batched detector: frames_bgr u8 (B, H, W, 3) -> the
    detect_postprocess_batch dict. The 300x300 cv2-parity resize, mean
    subtraction, the whole Caffe graph, decode and NMS run as ONE XLA
    program — face detection for all streams in a single device dispatch
    (round-2 verdict #1)."""

    @jax.jit
    def detect_batch(frames_bgr_u8: jax.Array):
        h, w = frames_bgr_u8.shape[1], frames_bgr_u8.shape[2]
        resized = jax.vmap(
            lambda f: resize_bilinear_u8_cv2(f, 300, 300))(frames_bgr_u8)
        blob = resized.astype(jnp.float32) - jnp.asarray(_MEAN_BGR)
        x = jnp.transpose(blob, (0, 3, 1, 2))       # NCHW
        det = net._forward(x)["detection_out"]      # (B, 1, K, 7)
        return detect_postprocess_batch(
            det, h, w, confidence_threshold, min_face_px)

    return detect_batch


class SSDRes10:
    def __init__(self, net: CaffeNet):
        self.net = net

    @classmethod
    def from_caffemodel(cls, caffemodel_path: str,
                        prototxt_path: Optional[str] = None) -> "SSDRes10":
        if prototxt_path is None:
            prototxt_path = os.path.join(
                os.path.dirname(caffemodel_path), "deploy.prototxt")
        return cls(CaffeNet(prototxt_path, caffemodel_path))

    def detect(self, frame_bgr: np.ndarray, confidence_threshold: float = 0.5,
               min_face_px: int = 20) -> List[Box]:
        h, w = frame_bgr.shape[:2]
        # blobFromImage equivalent: cv2-parity resize then mean subtract
        resized = np.asarray(resize_bilinear_u8_cv2(jnp.asarray(frame_bgr), 300, 300))
        blob = (resized.astype(np.float32) - _MEAN_BGR)
        x = np.transpose(blob, (2, 0, 1))[None]   # NCHW

        blobs = self.net.forward(x)
        det = np.asarray(blobs["detection_out"])   # (1,1,K,7)

        out: List[Box] = []
        for row in det[0, 0]:
            conf = float(row[2])
            if not np.isfinite(row[3:7]).all():
                # guard for degenerate decodes (exp overflow on garbage
                # weights); mirrored in detect_postprocess_batch so the
                # batched device path stays row-for-row identical
                continue
            if conf > confidence_threshold:
                x1 = int(row[3] * w)
                y1 = int(row[4] * h)
                x2 = int(row[5] * w)
                y2 = int(row[6] * h)
                x1, y1 = max(0, x1), max(0, y1)
                x2, y2 = min(w, x2), min(h, y2)
                bw, bh = x2 - x1, y2 - y1
                if bw > min_face_px and bh > min_face_px:
                    out.append((x1, y1, bw, bh))
        return out
