"""Caffe graph -> JAX compiler (replaces OpenCV's DNN engine for SSD nets).

The reference runs its primary face detector through cv2.dnn.readNetFromCaffe
(face_detection.py:24). Here the deploy.prototxt is parsed, the layer graph
is topologically executed as jitted JAX ops, and caffemodel blobs (parsed by
utils/caffe_convert.py, no caffe dependency) provide the weights. Supports
the op set of SSD detectors (res10_300x300 face SSD and kin):

  Convolution, BatchNorm+Scale, ReLU, Pooling(MAX/AVE, caffe ceil-mode),
  Eltwise(SUM/PROD/MAX), Permute, Flatten, Concat, Reshape, Softmax,
  PriorBox (computed statically), DetectionOutput (decode + NMS in JAX with
  fixed top-k padding, TPU-friendly).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.prototxt import load_prototxt, as_list
from ..utils.caffe_convert import load_caffemodel, conv_to_hwio


def _pool_out(size, k, s, p):
    # Caffe pooling uses ceil
    out = int(math.ceil((size + 2 * p - k) / s)) + 1
    if p > 0 and (out - 1) * s >= size + p:
        out -= 1
    return out


class CaffeNet:
    """Executable Caffe graph. NCHW blob semantics internally mapped to NHWC
    for the TPU; outputs are returned NCHW to match cv2.dnn."""

    def __init__(self, prototxt_path: str, caffemodel_path: Optional[str] = None,
                 weights: Optional[Dict[str, List[np.ndarray]]] = None):
        self.cfg = load_prototxt(prototxt_path)
        self.layers = as_list(self.cfg.get("layer") or self.cfg.get("layers"))
        self.weights = weights if weights is not None else (
            load_caffemodel(caffemodel_path) if caffemodel_path else {})
        self.input_name = self.cfg.get("input", "data")
        dims = as_list(self.cfg.get("input_dim"))
        if not dims and "input_shape" in self.cfg:
            dims = as_list(self.cfg["input_shape"].get("dim"))
        self.input_shape = tuple(int(d) for d in dims) if dims else (1, 3, 300, 300)
        self._forward_jit = jax.jit(self._forward)

    # ------------------------------------------------------------------ ops

    def _conv(self, lay, x, name):
        p = lay.get("convolution_param", {})
        k = int(p.get("kernel_size", 1))
        s = int(p.get("stride", 1))
        pad = int(p.get("pad", 0))
        blobs = self.weights.get(name, [])
        w = jnp.asarray(conv_to_hwio(np.asarray(blobs[0])))
        y = jax.lax.conv_general_dilated(
            x, w, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if p.get("bias_term", True) and len(blobs) > 1:
            y = y + jnp.asarray(blobs[1])
        return y

    def _bn(self, lay, x, name):
        blobs = self.weights.get(name, [])
        mean, var, sf = (np.asarray(b) for b in blobs[:3])
        scale = 1.0 / sf.reshape(-1)[0] if sf.reshape(-1)[0] != 0 else 0.0
        mean = mean * scale
        var = var * scale
        eps = float(lay.get("batch_norm_param", {}).get("eps", 1e-5))
        return (x - jnp.asarray(mean)) * jax.lax.rsqrt(jnp.asarray(var) + eps)

    def _scale(self, lay, x, name):
        blobs = self.weights.get(name, [])
        gamma = jnp.asarray(np.asarray(blobs[0]))
        y = x * gamma
        if lay.get("scale_param", {}).get("bias_term", False) and len(blobs) > 1:
            y = y + jnp.asarray(np.asarray(blobs[1]))
        return y

    def _pool(self, lay, x):
        p = lay.get("pooling_param", {})
        if p.get("global_pooling", False):
            if p.get("pool", "MAX") == "MAX":
                return jnp.max(x, axis=(1, 2), keepdims=True)
            return jnp.mean(x, axis=(1, 2), keepdims=True)
        k = int(p.get("kernel_size", 2))
        s = int(p.get("stride", 1))
        pad = int(p.get("pad", 0))
        h, w = x.shape[1], x.shape[2]
        oh, ow = _pool_out(h, k, s, pad), _pool_out(w, k, s, pad)
        # effective right/bottom padding so ceil-mode windows exist
        need_h = (oh - 1) * s + k - h
        need_w = (ow - 1) * s + k - w
        mode = p.get("pool", "MAX")
        if mode == "MAX":
            init, op = -jnp.inf, jax.lax.max
        else:
            init, op = 0.0, jax.lax.add
        y = jax.lax.reduce_window(
            x, init, op, (1, k, k, 1), (1, s, s, 1),
            [(0, 0), (pad, max(need_h - pad, 0) + pad), (pad, max(need_w - pad, 0) + pad), (0, 0)])
        y = y[:, :oh, :ow, :]
        if mode != "MAX":
            y = y / (k * k)
        return y

    def _prior_box(self, lay, feat_shape, img_shape):
        """PriorBox computed with numpy at trace time (static shapes)."""
        p = lay.get("prior_box_param", {})
        min_sizes = [float(v) for v in as_list(p.get("min_size"))]
        max_sizes = [float(v) for v in as_list(p.get("max_size"))]
        ars = [float(v) for v in as_list(p.get("aspect_ratio"))]
        flip = bool(p.get("flip", True))
        clip = bool(p.get("clip", False))
        variances = [float(v) for v in as_list(p.get("variance"))] or [0.1]
        step = float(p.get("step", 0))
        offset = float(p.get("offset", 0.5))

        fh, fw = feat_shape
        ih, iw = img_shape
        step_h = step or ih / fh
        step_w = step or iw / fw

        widths: List[float] = []
        heights: List[float] = []
        for i, ms in enumerate(min_sizes):
            widths.append(ms); heights.append(ms)
            if i < len(max_sizes):
                d = math.sqrt(ms * max_sizes[i])
                widths.append(d); heights.append(d)
            for ar in ars:
                if abs(ar - 1.0) < 1e-6:
                    continue
                widths.append(ms * math.sqrt(ar)); heights.append(ms / math.sqrt(ar))
                if flip:
                    widths.append(ms / math.sqrt(ar)); heights.append(ms * math.sqrt(ar))

        boxes = np.zeros((fh, fw, len(widths), 4), np.float32)
        for y in range(fh):
            for x in range(fw):
                cx = (x + offset) * step_w
                cy = (y + offset) * step_h
                for k, (bw, bh) in enumerate(zip(widths, heights)):
                    boxes[y, x, k] = [(cx - bw / 2) / iw, (cy - bh / 2) / ih,
                                      (cx + bw / 2) / iw, (cy + bh / 2) / ih]
        boxes = boxes.reshape(-1, 4)
        if clip:
            boxes = np.clip(boxes, 0.0, 1.0)
        if len(variances) == 1:
            var = np.full_like(boxes, variances[0])
        else:
            var = np.tile(np.asarray(variances, np.float32), (boxes.shape[0], 1))
        out = np.stack([boxes.reshape(-1), var.reshape(-1)])[None]  # (1,2,N*4)
        return jnp.asarray(out)

    # ------------------------------------------------------------- execution

    def _forward(self, x_nchw: jax.Array) -> Dict[str, jax.Array]:
        blobs: Dict[str, Any] = {}
        n, c, ih, iw = self.input_shape
        blobs[self.input_name] = jnp.transpose(x_nchw, (0, 2, 3, 1))  # NHWC
        layout: Dict[str, str] = {self.input_name: "NHWC"}

        def to_flat(name):
            v = blobs[name]
            if layout.get(name) == "NHWC":
                return v
            return v

        for lay in self.layers:
            t = lay.get("type")
            name = lay.get("name", "")
            bottoms = as_list(lay.get("bottom"))
            tops = as_list(lay.get("top")) or [name]
            if t in ("Input",):
                continue
            if t == "Convolution":
                y = self._conv(lay, blobs[bottoms[0]], name)
            elif t == "BatchNorm":
                y = self._bn(lay, blobs[bottoms[0]], name)
            elif t == "Scale":
                y = self._scale(lay, blobs[bottoms[0]], name)
            elif t == "ReLU":
                y = jax.nn.relu(blobs[bottoms[0]])
            elif t == "Pooling":
                y = self._pool(lay, blobs[bottoms[0]])
            elif t == "Eltwise":
                op = lay.get("eltwise_param", {}).get("operation", "SUM")
                vals = [blobs[b] for b in bottoms]
                if op == "SUM":
                    y = sum(vals[1:], vals[0])
                elif op == "PROD":
                    y = vals[0]
                    for v in vals[1:]:
                        y = y * v
                else:
                    y = vals[0]
                    for v in vals[1:]:
                        y = jnp.maximum(y, v)
            elif t == "Permute":
                order = [int(v) for v in as_list(lay["permute_param"]["order"])]
                # our tensor is NHWC; caffe order is about NCHW. Convert:
                v = jnp.transpose(blobs[bottoms[0]], (0, 3, 1, 2))  # to NCHW
                y = jnp.transpose(v, order)
                layout[tops[0]] = "OTHER"
            elif t == "Flatten":
                v = blobs[bottoms[0]]
                if layout.get(bottoms[0]) == "NHWC":
                    v = jnp.transpose(v, (0, 3, 1, 2))
                y = v.reshape(v.shape[0], -1)
                layout[tops[0]] = "OTHER"
            elif t == "Concat":
                axis = int(lay.get("concat_param", {}).get("axis", 1))
                vals = []
                for b in bottoms:
                    v = blobs[b]
                    if layout.get(b) == "NHWC" and v.ndim == 4:
                        v = jnp.transpose(v, (0, 3, 1, 2))
                    vals.append(v)
                y = jnp.concatenate(vals, axis=axis)
                layout[tops[0]] = "OTHER"
            elif t == "PriorBox":
                feat = blobs[bottoms[0]]
                fh, fw = (feat.shape[1], feat.shape[2]) \
                    if layout.get(bottoms[0]) == "NHWC" else (feat.shape[2], feat.shape[3])
                y = self._prior_box(lay, (fh, fw), (ih, iw))
                layout[tops[0]] = "OTHER"
            elif t == "Reshape":
                dims = [int(v) for v in as_list(lay["reshape_param"]["shape"]["dim"])]
                v = blobs[bottoms[0]]
                if layout.get(bottoms[0]) == "NHWC" and v.ndim == 4:
                    v = jnp.transpose(v, (0, 3, 1, 2))
                shape = []
                for i, d in enumerate(dims):
                    if d == 0:
                        shape.append(v.shape[i])
                    elif d == -1:
                        shape.append(-1)
                    else:
                        shape.append(d)
                y = v.reshape(shape)
                layout[tops[0]] = "OTHER"
            elif t == "Softmax":
                axis = int(lay.get("softmax_param", {}).get("axis", 1))
                y = jax.nn.softmax(blobs[bottoms[0]], axis=axis)
                layout[tops[0]] = layout.get(bottoms[0], "OTHER")
            elif t == "DetectionOutput":
                y = self._detection_output(lay, bottoms, blobs)
                layout[tops[0]] = "OTHER"
            else:
                raise NotImplementedError(f"Caffe layer type {t} ({name})")
            if t in ("Convolution", "BatchNorm", "Scale", "ReLU", "Pooling", "Eltwise"):
                layout[tops[0]] = "NHWC"
            blobs[tops[0]] = y
        return blobs

    def _detection_output(self, lay, bottoms, blobs, top_k_out: int = 200):
        """SSD decode + per-class NMS, fixed-size padded output (B,1,K,7)
        matching cv2.dnn's DetectionOutput rows
        [image_id, label, conf, x1, y1, x2, y2]. Batched: the per-example
        decode+NMS is vmapped over the leading batch axis (the conv trunk is
        natively batched), which is what lets the serving tick run face
        detection for all streams in one program."""
        p = lay.get("detection_output_param", {})
        num_classes = int(p.get("num_classes", 2))
        bg = int(p.get("background_label_id", 0))
        nms_p = p.get("nms_param", {})
        nms_thresh = float(nms_p.get("nms_threshold", 0.45))
        nms_top_k = int(nms_p.get("top_k", 400))
        keep_top_k = int(p.get("keep_top_k", 200))
        conf_thresh = float(p.get("confidence_threshold", 0.01))
        variance_encoded = bool(p.get("variance_encoded_in_target", False))

        # decode + NMS always run in f32, even when the trunk is bf16
        # (serving/batcher.make_device_step_detect ssd_bf16 mode)
        loc_all = blobs[bottoms[0]].astype(jnp.float32)   # (B, N*4)
        conf_all = blobs[bottoms[1]].astype(jnp.float32)  # (B, N*nc)
        priors = blobs[bottoms[2]][0].astype(jnp.float32)  # (2, N*4), shared
        pb = priors[0].reshape(-1, 4)
        pv = priors[1].reshape(-1, 4)
        pw = pb[:, 2] - pb[:, 0]
        ph = pb[:, 3] - pb[:, 1]
        pcx = (pb[:, 0] + pb[:, 2]) / 2
        pcy = (pb[:, 1] + pb[:, 3]) / 2

        def decode_one(loc_flat, conf_flat):
            loc = loc_flat.reshape(-1, 4)               # (N,4) deltas
            conf = conf_flat.reshape(-1, num_classes)
            # decode (CENTER_SIZE code type)
            if variance_encoded:
                cx = loc[:, 0] * pw + pcx
                cy = loc[:, 1] * ph + pcy
                bw = jnp.exp(loc[:, 2]) * pw
                bh = jnp.exp(loc[:, 3]) * ph
            else:
                cx = pv[:, 0] * loc[:, 0] * pw + pcx
                cy = pv[:, 1] * loc[:, 1] * ph + pcy
                bw = jnp.exp(pv[:, 2] * loc[:, 2]) * pw
                bh = jnp.exp(pv[:, 3] * loc[:, 3]) * ph
            boxes = jnp.stack(
                [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=1)

            rows = []
            for c in range(num_classes):
                if c == bg:
                    continue
                scores = conf[:, c]
                scores = jnp.where(scores >= conf_thresh, scores, 0.0)
                keep_scores, keep_boxes = _nms_padded(
                    scores, boxes, nms_thresh,
                    min(nms_top_k, scores.shape[0]), keep_top_k)
                label = jnp.full((keep_top_k, 1), float(c))
                img_id = jnp.zeros((keep_top_k, 1))
                rows.append(jnp.concatenate(
                    [img_id, label, keep_scores[:, None], keep_boxes], axis=1))
            out = jnp.concatenate(rows, axis=0)
            # order by score desc, cap at keep_top_k
            order = jnp.argsort(-out[:, 2])[:keep_top_k]
            return out[order]

        out = jax.vmap(decode_one)(loc_all, conf_all)   # (B, K, 7)
        return out[:, None]                             # (B, 1, K, 7)

    def forward(self, x_nchw: np.ndarray) -> Dict[str, jax.Array]:
        """x_nchw: (B, 3, H, W); every blob, including detection_out
        (B, 1, K, 7), carries the batch on the leading axis."""
        return self._forward_jit(jnp.asarray(x_nchw, jnp.float32))


def _nms_padded(scores: jax.Array, boxes: jax.Array, iou_thresh: float,
                top_k: int, out_k: int):
    """Greedy NMS with static shapes: pre-select top_k by score, then an
    O(top_k^2) mask-based suppression (fori_loop), padded to out_k."""
    top_k = min(top_k, scores.shape[0])
    vals, idx = jax.lax.top_k(scores, top_k)
    b = boxes[idx]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / union, 0.0)

    def body(i, keep):
        # suppress j>i overlapping with kept i
        sup = (iou[i] > iou_thresh) & (jnp.arange(top_k) > i) & keep[i] & (vals[i] > 0)
        return keep & ~sup

    keep = jax.lax.fori_loop(0, top_k, body, vals > 0)
    kept_scores = jnp.where(keep, vals, 0.0)
    order = jnp.argsort(-kept_scores)[:out_k]
    out_scores = kept_scores[order]
    out_boxes = b[order]
    pad = out_k - out_scores.shape[0]
    if pad > 0:
        out_scores = jnp.pad(out_scores, (0, pad))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
    return out_scores, out_boxes
