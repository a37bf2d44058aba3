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
import jax.numpy as jnp

from ..ops.resize import resize_bilinear_u8_cv2
from .caffe_net import CaffeNet

Box = Tuple[int, int, int, int]

_MEAN_BGR = np.array([104.0, 177.0, 123.0], np.float32)


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
