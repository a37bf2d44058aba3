"""MTCNN (P-Net / R-Net / O-Net) face alignment in functional JAX.

The reference aligns every face crop with facenet-pytorch's MTCNN
(deepfake_detection.py:24-28: select_largest=False, post_process=False,
image_size 160). This re-implements the three cascades and the detect flow
TPU-first:

  - static image pyramid (scales derived from the static input size, factor
    0.709, minsize 20)
  - fixed-capacity box lists (padded top-K + masks) instead of the
    reference's dynamic box arrays — XLA-friendly shapes throughout
  - NMS as masked O(K^2) suppression (same fixpoint as the stack walk)
  - crop+resize via bilinear gather grids

Weight source: facenet-pytorch's pnet.pt/rnet.pt/onet.pt state dicts
(convert_facenet_state_dict). Conv weights OIHW->HWIO; the dense layers
keep facenet's matlab-order permute(0,3,2,1)+flatten quirk.

KNOWN DEVIATION (documented): patch extraction uses bilinear sampling where
facenet uses torch 'area' interpolation; exact-area resampling is planned
with the integral-image path. Only affects environments that supply MTCNN
weights (none ship with either repo).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- nets

def _prelu(x, alpha):
    return jnp.where(x > 0, x, x * alpha)


def _conv(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _pool_ceil(x, k, s):
    """MaxPool2d(k, s, ceil_mode=True)."""
    h, w = x.shape[1], x.shape[2]
    oh = -(-(h - k) // s) + 1
    ow = -(-(w - k) // s) + 1
    pad_h = max((oh - 1) * s + k - h, 0)
    pad_w = max((ow - 1) * s + k - w, 0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)])


def pnet_forward(p: Dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (B,H,W,3) normalized. Returns (probs (B,h,w,2), reg (B,h,w,4))."""
    x = _prelu(_conv(x, p["conv1"]["w"], p["conv1"]["b"]), p["prelu1"])
    x = _pool_ceil(x, 2, 2)
    x = _prelu(_conv(x, p["conv2"]["w"], p["conv2"]["b"]), p["prelu2"])
    x = _prelu(_conv(x, p["conv3"]["w"], p["conv3"]["b"]), p["prelu3"])
    probs = jax.nn.softmax(_conv(x, p["conv4_1"]["w"], p["conv4_1"]["b"]), axis=-1)
    reg = _conv(x, p["conv4_2"]["w"], p["conv4_2"]["b"])
    return probs, reg


def _matlab_flatten(x: jax.Array) -> jax.Array:
    """facenet's permute(0,3,2,1)+flatten on an NCHW tensor; our tensors are
    NHWC so the equivalent is permute to (B, C, W, H) reversed -> (B, W, H, C)
    flatten? Match by converting NHWC->NCHW then permute(0,3,2,1)."""
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    return jnp.transpose(nchw, (0, 3, 2, 1)).reshape(x.shape[0], -1)


def rnet_forward(p: Dict, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x: (B,24,24,3). Returns (probs (B,2), reg (B,4))."""
    x = _prelu(_conv(x, p["conv1"]["w"], p["conv1"]["b"]), p["prelu1"])
    x = _pool_ceil(x, 3, 2)
    x = _prelu(_conv(x, p["conv2"]["w"], p["conv2"]["b"]), p["prelu2"])
    x = _pool_ceil(x, 3, 2)
    x = _prelu(_conv(x, p["conv3"]["w"], p["conv3"]["b"]), p["prelu3"])
    x = _matlab_flatten(x)
    x = _prelu(x @ p["dense4"]["w"] + p["dense4"]["b"], p["prelu4"])
    probs = jax.nn.softmax(x @ p["dense5_1"]["w"] + p["dense5_1"]["b"], axis=-1)
    reg = x @ p["dense5_2"]["w"] + p["dense5_2"]["b"]
    return probs, reg


def onet_forward(p: Dict, x: jax.Array):
    """x: (B,48,48,3). Returns (probs (B,2), reg (B,4), landmarks (B,10))."""
    x = _prelu(_conv(x, p["conv1"]["w"], p["conv1"]["b"]), p["prelu1"])
    x = _pool_ceil(x, 3, 2)
    x = _prelu(_conv(x, p["conv2"]["w"], p["conv2"]["b"]), p["prelu2"])
    x = _pool_ceil(x, 3, 2)
    x = _prelu(_conv(x, p["conv3"]["w"], p["conv3"]["b"]), p["prelu3"])
    x = _pool_ceil(x, 2, 2)
    x = _prelu(_conv(x, p["conv4"]["w"], p["conv4"]["b"]), p["prelu4"])
    x = _matlab_flatten(x)
    x = _prelu(x @ p["dense5"]["w"] + p["dense5"]["b"], p["prelu5"])
    probs = jax.nn.softmax(x @ p["dense6_1"]["w"] + p["dense6_1"]["b"], axis=-1)
    reg = x @ p["dense6_2"]["w"] + p["dense6_2"]["b"]
    pts = x @ p["dense6_3"]["w"] + p["dense6_3"]["b"]
    return probs, reg, pts


# ----------------------------------------------------- weight conversion

_PNET_CONVS = ["conv1", "conv2", "conv3", "conv4_1", "conv4_2"]
_RNET_CONVS = ["conv1", "conv2", "conv3"]
_ONET_CONVS = ["conv1", "conv2", "conv3", "conv4"]


def convert_facenet_state_dict(sd: Dict[str, np.ndarray], net: str) -> Dict:
    """torch state dict of facenet_pytorch PNet/RNet/ONet -> our pytree."""
    out: Dict = {}

    def conv(name):
        out[name] = {"w": jnp.asarray(np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))),
                     "b": jnp.asarray(sd[f"{name}.bias"])}

    def prelu(name):
        out[name] = jnp.asarray(sd[f"{name}.weight"]).reshape(1, 1, 1, -1)

    def dense(name):
        out[name] = {"w": jnp.asarray(sd[f"{name}.weight"].T),
                     "b": jnp.asarray(sd[f"{name}.bias"])}

    if net == "pnet":
        for c in _PNET_CONVS:
            conv(c)
        for i in (1, 2, 3):
            prelu(f"prelu{i}")
    elif net == "rnet":
        for c in _RNET_CONVS:
            conv(c)
        for i in (1, 2, 3):
            prelu(f"prelu{i}")
        dense("dense4")
        out["prelu4"] = jnp.asarray(sd["prelu4.weight"]).reshape(1, -1)
        dense("dense5_1")
        dense("dense5_2")
    elif net == "onet":
        for c in _ONET_CONVS:
            conv(c)
        for i in (1, 2, 3, 4):
            prelu(f"prelu{i}")
        dense("dense5")
        out["prelu5"] = jnp.asarray(sd["prelu5.weight"]).reshape(1, -1)
        dense("dense6_1")
        dense("dense6_2")
        dense("dense6_3")
    return out


def init_random_mtcnn(seed: int = 0) -> Dict[str, Dict]:
    """Random-init MTCNN params with the correct shapes (for tests and
    weightless environments)."""
    rng = np.random.default_rng(seed)

    def conv(cin, cout, k):
        return {"w": jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1),
                "b": jnp.zeros((cout,), jnp.float32)}

    def dense(cin, cout):
        return {"w": jnp.asarray(rng.standard_normal((cin, cout)).astype(np.float32) * 0.05),
                "b": jnp.zeros((cout,), jnp.float32)}

    def pr(c):
        return jnp.full((1, 1, 1, c), 0.25, jnp.float32)

    pnet = {"conv1": conv(3, 10, 3), "prelu1": pr(10),
            "conv2": conv(10, 16, 3), "prelu2": pr(16),
            "conv3": conv(16, 32, 3), "prelu3": pr(32),
            "conv4_1": conv(32, 2, 1), "conv4_2": conv(32, 4, 1)}
    rnet = {"conv1": conv(3, 28, 3), "prelu1": pr(28),
            "conv2": conv(28, 48, 3), "prelu2": pr(48),
            "conv3": conv(48, 64, 2), "prelu3": pr(64),
            "dense4": dense(576, 128), "prelu4": jnp.full((1, 128), 0.25),
            "dense5_1": dense(128, 2), "dense5_2": dense(128, 4)}
    onet = {"conv1": conv(3, 32, 3), "prelu1": pr(32),
            "conv2": conv(32, 64, 3), "prelu2": pr(64),
            "conv3": conv(64, 64, 3), "prelu3": pr(64),
            "conv4": conv(64, 128, 2), "prelu4": pr(128),
            "dense5": dense(1152, 256), "prelu5": jnp.full((1, 256), 0.25),
            "dense6_1": dense(256, 2), "dense6_2": dense(256, 4),
            "dense6_3": dense(256, 10)}
    return {"pnet": pnet, "rnet": rnet, "onet": onet}


# ----------------------------------------------------------- detect flow

def _normalize(x: jax.Array) -> jax.Array:
    """facenet preprocessing: (x - 127.5) * 0.0078125."""
    return (x - 127.5) * 0.0078125


def _nms_mask(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
              thresh: float, method_min: bool = False) -> jax.Array:
    """Greedy NMS over fixed K boxes; returns keep mask."""
    k = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    if method_min:
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    iou = jnp.where(denom > 0, inter / denom, 0.0)

    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    inv = jnp.argsort(order)
    iou_s = iou[order][:, order]
    valid_s = valid[order]

    def body(i, keep):
        sup = (iou_s[i] > thresh) & (jnp.arange(k) > i) & keep[i]
        return keep & ~sup

    keep_s = jax.lax.fori_loop(0, k, body, valid_s)
    return keep_s[inv]


def _crop_resize_bilinear(img: jax.Array, box: jax.Array, out: int) -> jax.Array:
    """Crop box=(x1,y1,x2,y2) (inclusive-exclusive pixel coords, float) from
    img (H,W,3) and resize to (out,out,3) with half-pixel bilinear."""
    h, w = img.shape[0], img.shape[1]
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    u = (jnp.arange(out, dtype=jnp.float32) + 0.5) * (bw / out) + x1 - 0.5
    v = (jnp.arange(out, dtype=jnp.float32) + 0.5) * (bh / out) + y1 - 0.5
    u0 = jnp.clip(jnp.floor(u), 0, w - 1).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v), 0, h - 1).astype(jnp.int32)
    u1 = jnp.clip(u0 + 1, 0, w - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    fu = jnp.clip(u - u0, 0.0, 1.0)
    fv = jnp.clip(v - v0, 0.0, 1.0)
    tl = img[v0[:, None], u0[None, :]]
    tr = img[v0[:, None], u1[None, :]]
    bl = img[v1[:, None], u0[None, :]]
    br = img[v1[:, None], u1[None, :]]
    top = tl * (1 - fu)[None, :, None] + tr * fu[None, :, None]
    bot = bl * (1 - fu)[None, :, None] + br * fu[None, :, None]
    return top * (1 - fv)[:, None, None] + bot * fv[:, None, None]


def _rerec(boxes: jax.Array) -> jax.Array:
    """Square-ify boxes around their center (facenet rerec)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    l = jnp.maximum(w, h)
    cx = boxes[:, 0] + w * 0.5
    cy = boxes[:, 1] + h * 0.5
    return jnp.stack([cx - l / 2, cy - l / 2, cx + l / 2, cy + l / 2], axis=1)


class MTCNNAligner:
    """Reference-compatible aligner: BGR face crop -> aligned 160x160 RGB
    float (raw 0-255), or None when no face is found inside the crop
    (deepfake_detection.py:376-383 contract). Compiles one program per input
    size bucket (crop sizes rounded up to multiples of 32)."""

    MAX_P, MAX_R, MAX_O = 256, 64, 16

    def __init__(self, params: Dict[str, Dict], image_size: int = 160,
                 minsize: int = 20, thresholds=(0.6, 0.7, 0.7),
                 factor: float = 0.709):
        self.params = params
        self.image_size = image_size
        self.minsize = minsize
        self.thresholds = thresholds
        self.factor = factor
        self._compiled = {}

    @classmethod
    def from_weights(cls, path_or_dir: str) -> "MTCNNAligner":
        """Load facenet-pytorch pnet.pt/rnet.pt/onet.pt (a directory), or a
        single .pt containing all three prefixed state dicts."""
        import os
        import torch
        params = {}
        if os.path.isdir(path_or_dir):
            for net in ("pnet", "rnet", "onet"):
                sd = torch.load(os.path.join(path_or_dir, f"{net}.pt"),
                                map_location="cpu", weights_only=False)
                sd = {k: v.numpy() for k, v in sd.items()}
                params[net] = convert_facenet_state_dict(sd, net)
        else:
            sd = torch.load(path_or_dir, map_location="cpu", weights_only=False)
            sd = {k: v.numpy() for k, v in sd.items()}
            for net in ("pnet", "rnet", "onet"):
                sub = {k[len(net) + 1:]: v for k, v in sd.items()
                       if k.startswith(net + ".")}
                params[net] = convert_facenet_state_dict(sub, net)
        return cls(params)

    def _scales(self, h: int, w: int) -> List[float]:
        m = 12.0 / self.minsize
        minl = min(h, w) * m
        scales = []
        s = m
        while minl >= 12:
            scales.append(s)
            s *= self.factor
            minl *= self.factor
        return scales

    def _detect_fn(self, h: int, w: int):
        scales = self._scales(h, w)
        params = self.params
        t1, t2, t3 = self.thresholds
        MAX_P, MAX_R, MAX_O = self.MAX_P, self.MAX_R, self.MAX_O

        def run(img_rgb: jax.Array):
            x = _normalize(img_rgb.astype(jnp.float32))

            all_boxes = []
            all_scores = []
            for scale in scales:
                sh, sw = max(int(h * scale + 1e-6), 12), max(int(w * scale + 1e-6), 12)
                scaled = _crop_resize_bilinear(
                    x, jnp.asarray([0.0, 0.0, float(w), float(h)]), max(sh, sw))
                scaled = scaled[:sh, :sw]
                probs, reg = pnet_forward(params["pnet"], scaled[None])
                p = probs[0, :, :, 1]
                r = reg[0]
                gh, gw = p.shape
                k = min(MAX_P, gh * gw)
                flat_p = p.reshape(-1)
                vals, idx = jax.lax.top_k(flat_p, k)
                iy = idx // gw
                ix = idx % gw
                # generateBoundingBox: stride 2, cell 12
                q1x = jnp.floor((2.0 * ix + 1.0) / scale)
                q1y = jnp.floor((2.0 * iy + 1.0) / scale)
                q2x = jnp.floor((2.0 * ix + 12.0) / scale)
                q2y = jnp.floor((2.0 * iy + 12.0) / scale)
                rr = r.reshape(-1, 4)[idx]
                bw_ = q2x - q1x
                bh_ = q2y - q1y
                boxes = jnp.stack([q1x + rr[:, 0] * bw_, q1y + rr[:, 1] * bh_,
                                   q2x + rr[:, 2] * bw_, q2y + rr[:, 3] * bh_], axis=1)
                valid = vals >= t1
                keep = _nms_mask(boxes, vals, valid, 0.5)
                pad = MAX_P - k
                all_boxes.append(jnp.pad(boxes, ((0, pad), (0, 0))))
                all_scores.append(jnp.pad(jnp.where(keep, vals, 0.0), (0, pad)))

            boxes = jnp.concatenate(all_boxes)
            scores = jnp.concatenate(all_scores)
            vals, idx = jax.lax.top_k(scores, MAX_P)
            boxes = boxes[idx]
            keep = _nms_mask(boxes, vals, vals > 0, 0.7)
            scores = jnp.where(keep, vals, 0.0)
            boxes = _rerec(boxes)

            # ---- R-Net stage
            vals, idx = jax.lax.top_k(scores, MAX_R)
            rboxes = boxes[idx]
            patches = jax.vmap(lambda b: _crop_resize_bilinear(x, b, 24))(rboxes)
            probs, reg = rnet_forward(params["rnet"], patches)
            rscores = jnp.where((probs[:, 1] >= t2) & (vals > 0), probs[:, 1], 0.0)
            keep = _nms_mask(rboxes, rscores, rscores > 0, 0.7)
            rscores = jnp.where(keep, rscores, 0.0)
            bw_ = rboxes[:, 2] - rboxes[:, 0]
            bh_ = rboxes[:, 3] - rboxes[:, 1]
            rboxes = jnp.stack([
                rboxes[:, 0] + reg[:, 0] * bw_, rboxes[:, 1] + reg[:, 1] * bh_,
                rboxes[:, 2] + reg[:, 2] * bw_, rboxes[:, 3] + reg[:, 3] * bh_],
                axis=1)
            rboxes = _rerec(rboxes)

            # ---- O-Net stage
            vals, idx = jax.lax.top_k(rscores, MAX_O)
            oboxes = rboxes[idx]
            patches = jax.vmap(lambda b: _crop_resize_bilinear(x, b, 48))(oboxes)
            probs, reg, _pts = onet_forward(params["onet"], patches)
            oscores = jnp.where((probs[:, 1] >= t3) & (vals > 0), probs[:, 1], 0.0)
            bw_ = oboxes[:, 2] - oboxes[:, 0]
            bh_ = oboxes[:, 3] - oboxes[:, 1]
            oboxes = jnp.stack([
                oboxes[:, 0] + reg[:, 0] * bw_, oboxes[:, 1] + reg[:, 1] * bh_,
                oboxes[:, 2] + reg[:, 2] * bw_, oboxes[:, 3] + reg[:, 3] * bh_],
                axis=1)
            keep = _nms_mask(oboxes, oscores, oscores > 0, 0.7, method_min=True)
            oscores = jnp.where(keep, oscores, 0.0)

            # highest-probability face (select_largest=False)
            best = jnp.argmax(oscores)
            best_score = oscores[best]
            best_box = oboxes[best]
            face = _crop_resize_bilinear(
                img_rgb.astype(jnp.float32), best_box, self.image_size)
            return face, best_score

        return jax.jit(run)

    def __call__(self, face_bgr: np.ndarray) -> Optional[np.ndarray]:
        h, w = face_bgr.shape[:2]
        if h < 12 or w < 12:
            return None
        bh = min(-(-h // 32) * 32, 512)
        bw = min(-(-w // 32) * 32, 512)
        key = (bh, bw)
        if key not in self._compiled:
            self._compiled[key] = self._detect_fn(bh, bw)
        canvas = np.zeros((bh, bw, 3), np.float32)
        canvas[:h, :w] = face_bgr[..., ::-1].astype(np.float32)
        face, score = self._compiled[key](jnp.asarray(canvas))
        if float(score) <= 0.0:
            return None
        return np.asarray(face)
