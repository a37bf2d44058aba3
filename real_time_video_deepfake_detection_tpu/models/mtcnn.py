"""MTCNN (P-Net / R-Net / O-Net) face alignment in functional JAX.

The reference aligns every face crop with facenet-pytorch's MTCNN
(deepfake_detection.py:24-28: select_largest=False, post_process=False,
image_size 160). This re-implements the three cascades and the detect flow
TPU-first:

  - static image pyramid (scales derived from the static input size, factor
    0.709, minsize 20); pyramid resampling is facenet's 'area' interpolation
    (== adaptive average pooling) expressed as two static matmuls — MXU work
    instead of a gather
  - fixed-capacity box lists (padded top-K + masks) instead of the
    reference's dynamic box arrays — XLA-friendly shapes throughout
  - NMS as masked O(K^2) suppression (same fixpoint as the stack walk)
  - R/O-Net patch extraction reproduces facenet's pad() integer crop +
    'area' resample via box-dependent weight matrices built inside jit
    (dynamic boxes, static shapes)
  - the final 160x160 crop reproduces PIL Image.BILINEAR (antialiased
    triangle filter, normalized over clipped taps) — the reference passes a
    PIL image so extract_face takes the PIL path
    (facenet crop_resize / deepfake_detection.py:376-383)

Regression/NMS ordering matches facenet detect_face exactly: stage 1
regresses AFTER the cross-scale NMS (no +1 width), stages 2/3 use bbreg's
w = x2-x1+1 convention, O-Net regresses before its 'Min'-IoU NMS.

Weight source: facenet-pytorch's pnet.pt/rnet.pt/onet.pt state dicts
(convert_facenet_state_dict). Conv weights OIHW->HWIO; the dense layers
keep facenet's matlab-order permute(0,3,2,1)+flatten quirk.

Remaining documented deviation: compute is float32 throughout; PIL's uint8
resize quantizes coefficients and output to 8 bits, so the aligned crop can
differ from the reference by <=1 grey level per pixel (tests/test_mtcnn.py
asserts box/score parity at 1e-3 and crop parity at 1.0/255).
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


def _bbreg(boxes: jax.Array, reg: jax.Array) -> jax.Array:
    """facenet bbreg: regression scaled by w = x2-x1+1 (note the +1 —
    stage 1's inline regression in detect_face uses no +1; stages 2/3 use
    this function)."""
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    return jnp.stack([boxes[:, 0] + reg[:, 0] * w,
                      boxes[:, 1] + reg[:, 1] * h,
                      boxes[:, 2] + reg[:, 2] * w,
                      boxes[:, 3] + reg[:, 3] * h], axis=1)


# ------------------------------------------------- resampling as matmuls

def _adaptive_weights_np(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix implementing torch 'area'
    interpolation (== adaptive_avg_pool): output i averages input
    [floor(i*n_in/n_out), ceil((i+1)*n_in/n_out))."""
    W = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = (i * n_in) // n_out
        e = -((-(i + 1) * n_in) // n_out)
        W[i, s:e] = 1.0 / (e - s)
    return W


def _area_resize_static(x: jax.Array, sh: int, sw: int) -> jax.Array:
    """(H,W,C) -> (sh,sw,C) area resize with static sizes: two matmuls (MXU
    work) instead of a gather."""
    Wh = jnp.asarray(_adaptive_weights_np(x.shape[0], sh))
    Ww = jnp.asarray(_adaptive_weights_np(x.shape[1], sw))
    y = jnp.einsum("oh,hwc->owc", Wh, x)
    return jnp.einsum("pw,owc->opc", Ww, y)


def _adaptive_weights_dyn(start, length, n_out: int, n_src: int) -> jax.Array:
    """Area-interpolation weights for a crop [start, start+length) of a
    static-size axis, with start/length dynamic int32 scalars. Returns
    (n_out, n_src)."""
    i = jnp.arange(n_out, dtype=jnp.int32)
    L = jnp.maximum(length, 1)
    s = (i * L) // n_out
    e = ((i + 1) * L + n_out - 1) // n_out
    j = jnp.arange(n_src, dtype=jnp.int32)
    inside = (j[None, :] >= start + s[:, None]) & (j[None, :] < start + e[:, None])
    return inside.astype(jnp.float32) / jnp.maximum(e - s, 1)[:, None]


def _pil_weights_dyn(start, length, n_out: int, n_src: int) -> jax.Array:
    """PIL Image.BILINEAR resize weights for a crop [start, start+length):
    triangle filter with support scaled by the downscale factor, taps
    clipped to the crop and renormalized (PIL precompute_coeffs). start and
    length are dynamic int32 scalars; shapes are static."""
    L = jnp.maximum(length, 1).astype(jnp.float32)
    scale = L / n_out
    support = jnp.maximum(scale, 1.0)
    centers = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale
    j = jnp.arange(n_src, dtype=jnp.float32)
    rel = j[None, :] - start.astype(jnp.float32) + 0.5   # crop-frame centers
    w = jnp.maximum(0.0, 1.0 - jnp.abs(rel - centers[:, None]) / support)
    inside = (j[None, :] >= start) & (j[None, :] < start + jnp.maximum(length, 1))
    w = w * inside
    return w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)


def _extract_patch_area(img: jax.Array, box: jax.Array, out: int) -> jax.Array:
    """facenet pad() + integer crop + 'area' resample to (out,out,3).
    box is float (x1,y1,x2,y2); img is the full static-size image."""
    h, w = img.shape[0], img.shape[1]
    b = jnp.trunc(box).astype(jnp.int32)
    x = jnp.maximum(b[0], 1)
    y = jnp.maximum(b[1], 1)
    ex = jnp.minimum(b[2], w)
    ey = jnp.minimum(b[3], h)
    Wv = _adaptive_weights_dyn(y - 1, ey - (y - 1), out, h)
    Wu = _adaptive_weights_dyn(x - 1, ex - (x - 1), out, w)
    patch = jnp.einsum("oh,hwc->owc", Wv, img)
    return jnp.einsum("pw,owc->opc", Wu, patch)


def _extract_face_pil(img: jax.Array, box: jax.Array, out: int) -> jax.Array:
    """facenet extract_face with margin=0 on a PIL image: int-clipped crop +
    PIL BILINEAR resize to (out,out,3)."""
    h, w = img.shape[0], img.shape[1]
    x1 = jnp.trunc(jnp.maximum(box[0], 0)).astype(jnp.int32)
    y1 = jnp.trunc(jnp.maximum(box[1], 0)).astype(jnp.int32)
    x2 = jnp.trunc(jnp.minimum(box[2], w)).astype(jnp.int32)
    y2 = jnp.trunc(jnp.minimum(box[3], h)).astype(jnp.int32)
    Wv = _pil_weights_dyn(y1, y2 - y1, out, h)
    Wu = _pil_weights_dyn(x1, x2 - x1, out, w)
    face = jnp.einsum("oh,hwc->owc", Wv, img)
    return jnp.einsum("pw,owc->opc", Wu, face)


def pyramid_scales(h: int, w: int, minsize: int = 20,
                   factor: float = 0.709) -> List[float]:
    """facenet detect_face's image-pyramid scales for a static (h, w)."""
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales = []
    s = m
    while minl >= 12:
        scales.append(s)
        s *= factor
        minl *= factor
    return scales


def mtcnn_detect_static(params: Dict, img_rgb: jax.Array, *,
                        image_size: int = 160, minsize: int = 20,
                        thresholds=(0.6, 0.7, 0.7), factor: float = 0.709,
                        max_p: int = 256, max_r: int = 64, max_o: int = 16):
    """The full P/R/O cascade for ONE image of STATIC size — traceable (and
    vmappable: the device-detect tick batches it over streams,
    serving/batcher.make_device_step_detect mtcnn_device mode). Mirrors
    facenet-pytorch detect_face stage by stage (see module docstring for the
    resampling/regression conventions).

    img_rgb: (H, W, 3) float RGB 0-255. Returns (face (image_size²x3 f32
    raw-range RGB), score, box); score <= 0 means no face passed the cascade
    (the caller treats that as facenet's `mtcnn(img) is None`)."""
    h, w = img_rgb.shape[0], img_rgb.shape[1]
    scales = pyramid_scales(h, w, minsize, factor)
    t1, t2, t3 = thresholds
    img = img_rgb.astype(jnp.float32)

    # ---- P-Net over the area-interpolated pyramid
    all_boxes, all_scores, all_regs = [], [], []
    for scale in scales:
        sh, sw = int(h * scale + 1), int(w * scale + 1)
        scaled = _normalize(_area_resize_static(img, sh, sw))
        probs, reg = pnet_forward(params["pnet"], scaled[None])
        p = probs[0, :, :, 1]
        gh, gw = p.shape
        k = min(max_p, gh * gw)
        vals, idx = jax.lax.top_k(p.reshape(-1), k)
        iy = idx // gw
        ix = idx % gw
        # generateBoundingBox: stride 2, cell 12, raw (unregressed)
        q1x = jnp.floor((2.0 * ix + 1.0) / scale)
        q1y = jnp.floor((2.0 * iy + 1.0) / scale)
        q2x = jnp.floor((2.0 * ix + 12.0) / scale)
        q2y = jnp.floor((2.0 * iy + 12.0) / scale)
        boxes = jnp.stack([q1x, q1y, q2x, q2y], axis=1)
        rr = reg[0].reshape(-1, 4)[idx]
        valid = vals >= t1
        keep = _nms_mask(boxes, vals, valid, 0.5)   # per-scale NMS
        pad = max_p - k
        all_boxes.append(jnp.pad(boxes, ((0, pad), (0, 0))))
        all_scores.append(jnp.pad(jnp.where(keep, vals, 0.0), (0, pad)))
        all_regs.append(jnp.pad(rr, ((0, pad), (0, 0))))

    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    regs = jnp.concatenate(all_regs)
    vals, idx = jax.lax.top_k(scores, max_p)
    boxes, regs = boxes[idx], regs[idx]
    keep = _nms_mask(boxes, vals, vals > 0, 0.7)    # cross-scale NMS
    scores = jnp.where(keep, vals, 0.0)
    # stage-1 regression AFTER the NMS, inline convention (no +1)
    regw = boxes[:, 2] - boxes[:, 0]
    regh = boxes[:, 3] - boxes[:, 1]
    boxes = jnp.stack([boxes[:, 0] + regs[:, 0] * regw,
                       boxes[:, 1] + regs[:, 1] * regh,
                       boxes[:, 2] + regs[:, 2] * regw,
                       boxes[:, 3] + regs[:, 3] * regh], axis=1)
    boxes = _rerec(boxes)

    # ---- R-Net stage
    vals, idx = jax.lax.top_k(scores, max_r)
    rboxes = boxes[idx]
    patches = jax.vmap(lambda b: _extract_patch_area(img, b, 24))(rboxes)
    probs, reg = rnet_forward(params["rnet"], _normalize(patches))
    rscores = jnp.where((probs[:, 1] > t2) & (vals > 0), probs[:, 1], 0.0)
    keep = _nms_mask(rboxes, rscores, rscores > 0, 0.7)  # raw boxes
    rscores = jnp.where(keep, rscores, 0.0)
    rboxes = _bbreg(rboxes, reg)                    # +1 convention
    rboxes = _rerec(rboxes)

    # ---- O-Net stage (regression BEFORE the 'Min'-IoU NMS)
    vals, idx = jax.lax.top_k(rscores, max_o)
    oboxes = rboxes[idx]
    patches = jax.vmap(lambda b: _extract_patch_area(img, b, 48))(oboxes)
    probs, reg, _pts = onet_forward(params["onet"], _normalize(patches))
    oscores = jnp.where((probs[:, 1] > t3) & (vals > 0), probs[:, 1], 0.0)
    oboxes = _bbreg(oboxes, reg)
    keep = _nms_mask(oboxes, oscores, oscores > 0, 0.7, method_min=True)
    oscores = jnp.where(keep, oscores, 0.0)

    # highest-probability face (select_largest=False -> the NMS order is
    # score-descending, facenet takes boxes[0])
    best = jnp.argmax(oscores)
    best_score = oscores[best]
    best_box = oboxes[best]
    face = _extract_face_pil(img, best_box, image_size)
    return face, best_score, best_box


def mtcnn_align_batch(params: Dict, crops_rgb: jax.Array, *,
                      image_size: int = 160, minsize: int = 20,
                      thresholds=(0.6, 0.7, 0.7), factor: float = 0.709,
                      max_p: int = 64, max_r: int = 16, max_o: int = 8):
    """Batched cascade over (B, S, S, 3) fixed-size RGB crops — the
    device-tick MTCNN aligner (serving/batcher mtcnn_device mode). The crop
    size is static so the pyramid is static; smaller default box caps than
    the host aligner because an SSD face crop holds at most one face (caps
    are a config knob upstream). Returns (faces (B, image_size, image_size,
    3) f32, scores (B,), boxes (B, 4))."""
    fn = partial(mtcnn_detect_static, params, image_size=image_size,
                 minsize=minsize, thresholds=thresholds, factor=factor,
                 max_p=max_p, max_r=max_r, max_o=max_o)
    return jax.vmap(fn)(crops_rgb)


class MTCNNAligner:
    """Reference-compatible aligner: BGR face crop -> aligned 160x160 RGB
    float (raw 0-255), or None when no face is found inside the crop
    (deepfake_detection.py:376-383 contract). Compiles one program per exact
    input size (LRU-bounded), matching facenet's eager-size behavior."""

    MAX_P, MAX_R, MAX_O = 256, 64, 16

    def __init__(self, params: Dict[str, Dict], image_size: int = 160,
                 minsize: int = 20, thresholds=(0.6, 0.7, 0.7),
                 factor: float = 0.709, max_compiled: int = 64):
        self.params = params
        self.image_size = image_size
        self.minsize = minsize
        self.thresholds = thresholds
        self.factor = factor
        self.max_compiled = max_compiled
        self._compiled = {}

    @classmethod
    def from_weights(cls, path_or_dir: str) -> "MTCNNAligner":
        """Load facenet-pytorch pnet.pt/rnet.pt/onet.pt (a directory), or a
        single .pt containing all three prefixed state dicts.

        weights_only=True always: these are plain tensor state dicts, and
        this path feeds the serving bootstrap (--mtcnn-weights), so a full
        unpickle of a downloaded file would be an arbitrary-code-execution
        surface (same reasoning as cli/fetch_weights)."""
        import os
        import torch
        params = {}
        if os.path.isdir(path_or_dir):
            for net in ("pnet", "rnet", "onet"):
                sd = torch.load(os.path.join(path_or_dir, f"{net}.pt"),
                                map_location="cpu", weights_only=True)
                sd = {k: v.numpy() for k, v in sd.items()}
                params[net] = convert_facenet_state_dict(sd, net)
        else:
            sd = torch.load(path_or_dir, map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in sd.items()}
            for net in ("pnet", "rnet", "onet"):
                sub = {k[len(net) + 1:]: v for k, v in sd.items()
                       if k.startswith(net + ".")}
                params[net] = convert_facenet_state_dict(sub, net)
        return cls(params)

    def _scales(self, h: int, w: int) -> List[float]:
        return pyramid_scales(h, w, self.minsize, self.factor)

    def _detect_fn(self, h: int, w: int):
        """Compile the full cascade (mtcnn_detect_static) for an exact
        (h, w) input."""
        del h, w   # static shapes come from the traced argument
        return jax.jit(partial(
            mtcnn_detect_static, self.params, image_size=self.image_size,
            minsize=self.minsize, thresholds=self.thresholds,
            factor=self.factor, max_p=self.MAX_P, max_r=self.MAX_R,
            max_o=self.MAX_O))

    def detect(self, face_bgr: np.ndarray):
        """Full detect: (aligned 160x160x3 RGB f32 raw-range, score, box) or
        (None, 0.0, None). Compiles one program per exact input size (the
        reference's torch path is eager so any size works; an LRU of
        compiled sizes bounds memory)."""
        h, w = face_bgr.shape[:2]
        if min(h, w) < self.minsize or not self._scales(h, w):
            return None, 0.0, None
        key = (h, w)
        fn = self._compiled.pop(key, None)
        if fn is None:
            if len(self._compiled) >= self.max_compiled:
                self._compiled.pop(next(iter(self._compiled)))  # true LRU
            fn = self._detect_fn(h, w)
        self._compiled[key] = fn   # (re-)insert most-recently-used last
        rgb = jnp.asarray(face_bgr[..., ::-1].astype(np.float32))
        face, score, box = fn(rgb)
        if float(score) <= 0.0:
            return None, 0.0, None
        return np.asarray(face), float(score), np.asarray(box)

    def __call__(self, face_bgr: np.ndarray) -> Optional[np.ndarray]:
        face, _score, _box = self.detect(face_bgr)
        return face
