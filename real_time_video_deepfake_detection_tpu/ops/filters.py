"""Spatial filters as jnp ops, matched to the exact OpenCV calls the
forensic signals make (reference frame_analysis.py):

  - cv2.GaussianBlur(gray_f32, (5,5), 0)   -> noise residual (:191)
  - cv2.Laplacian(gray_u8, CV_64F)         -> sharpness measure (:292)
  - cv2.Canny(gray_u8, 50, 150)            -> edge density (:288)

Notes on exactness:
  - GaussianBlur with sigma=0 and ksize<=7 uses OpenCV's fixed small-kernel
    table: [1,4,6,4,1]/16 (NOT the sigma formula). Border REFLECT_101.
  - Laplacian ksize=1 is the 4-neighbour kernel [[0,1,0],[1,-4,1],[0,1,0]],
    border REFLECT_101.
  - Canny uses Sobel-3 with BORDER_REPLICATE, L1 gradient magnitude, OpenCV's
    tan(22.5°) fixed-point direction quantization for NMS, and BFS hysteresis
    (reproduced here as an iterated masked dilation run to fixpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_GAUSS5 = jnp.asarray(np.array([1, 4, 6, 4, 1], np.float32) / 16.0)


def _pad_reflect101(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((p, p), (p, p)), mode="reflect")


def _pad_replicate(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((p, p), (p, p)), mode="edge")


def _sep_filter(x: jax.Array, kx: jax.Array, ky: jax.Array, pad: str) -> jax.Array:
    """Separable 2D correlation on an HW float array."""
    p = (kx.shape[0] - 1) // 2
    xp = _pad_reflect101(x, p) if pad == "reflect101" else _pad_replicate(x, p)
    h, w = x.shape
    # Horizontal then vertical taps as shifted adds (small kernels -> cheaper
    # than conv for the VPU, and XLA fuses the adds).
    acc = jnp.zeros((h + 2 * p, w), x.dtype)
    for i in range(kx.shape[0]):
        acc = acc + xp[:, i:i + w] * kx[i]
    out = jnp.zeros((h, w), x.dtype)
    for j in range(ky.shape[0]):
        out = out + acc[j:j + h, :] * ky[j]
    return out


def gaussian_blur5_f32(x: jax.Array) -> jax.Array:
    """cv2.GaussianBlur(x_f32, (5,5), 0) — binomial [1,4,6,4,1]/16 separable,
    REFLECT_101 border."""
    return _sep_filter(x, _GAUSS5, _GAUSS5, "reflect101")


def laplacian4(x: jax.Array) -> jax.Array:
    """cv2.Laplacian(gray, CV_64F) with default ksize=1: 4-neighbour kernel,
    REFLECT_101 border. Returns float32 (f64 unsupported on TPU; the
    downstream variance threshold at 50/100 tolerates f32)."""
    xf = x.astype(jnp.float32)
    p = _pad_reflect101(xf, 1)
    h, w = x.shape
    return (p[0:h, 1:w + 1] + p[2:h + 2, 1:w + 1] + p[1:h + 1, 0:w]
            + p[1:h + 1, 2:w + 2] - 4.0 * xf)


def laplacian_var(gray_u8: jax.Array) -> jax.Array:
    """np.var(cv2.Laplacian(gray, CV_64F)) (reference frame_analysis.py:292-293)."""
    lap = laplacian4(gray_u8)
    m = jnp.mean(lap)
    return jnp.mean((lap - m) ** 2)


def sobel3_dx_dy(gray: jax.Array):
    """Sobel 3x3 dx and dy with BORDER_REPLICATE, int32 (Canny's gradients)."""
    g = gray.astype(jnp.int32)
    p = _pad_replicate(g, 1)
    h, w = gray.shape
    # dx: correlate rows with [-1,0,1], columns with [1,2,1]
    hdiff = p[:, 2:w + 2] - p[:, 0:w]              # (h+2, w)
    dx = hdiff[0:h] + 2 * hdiff[1:h + 1] + hdiff[2:h + 2]
    # dy: correlate columns with [-1,0,1], rows with [1,2,1]
    vdiff = p[2:h + 2, :] - p[0:h, :]              # (h, w+2)
    dy = vdiff[:, 0:w] + 2 * vdiff[:, 1:w + 1] + vdiff[:, 2:w + 2]
    return dx, dy


_TG22 = 13573  # round(tan(22.5 deg) * 2^15), OpenCV canny.cpp


def canny(gray_u8: jax.Array, low: int = 50, high: int = 150) -> jax.Array:
    """cv2.Canny(gray, low, high) — aperture 3, L1 gradient. Returns uint8
    {0,255} edge map.

    NMS reproduces OpenCV's fixed-point direction quantization; hysteresis is
    OpenCV's stack-based flood fill re-expressed as masked dilation iterated
    to fixpoint inside lax.while_loop (same fixpoint, TPU-friendly).
    """
    dx, dy = sobel3_dx_dy(gray_u8)
    mag = jnp.abs(dx) + jnp.abs(dy)  # L1 (L2gradient=False)

    h, w = mag.shape
    magp = jnp.pad(mag, 1, mode="constant", constant_values=0)

    def nb(dy_, dx_):
        return magp[1 + dy_:1 + dy_ + h, 1 + dx_:1 + dx_ + w]

    m = mag
    x = jnp.abs(dx)
    y = jnp.abs(dy) << 15
    tg22x = x * _TG22
    tg67x = tg22x + ((x << 16))

    horizontal = y < tg22x
    vertical = y > tg67x
    # diagonal sign: s = +1 if dx and dy have the same sign else -1
    s = jnp.where((dx ^ dy) < 0, -1, 1)

    keep_h = (m > nb(0, -1)) & (m >= nb(0, 1))
    keep_v = (m > nb(-1, 0)) & (m >= nb(1, 0))
    # diagonal: compare along the gradient direction (both STRICT >, unlike
    # the horizontal/vertical cases — OpenCV canny.cpp)
    diag1 = (m > nb(-1, -1)) & (m > nb(1, 1))   # s == +1
    diag2 = (m > nb(-1, 1)) & (m > nb(1, -1))   # s == -1
    keep_d = jnp.where(s > 0, diag1, diag2)

    keep = jnp.where(horizontal, keep_h, jnp.where(vertical, keep_v, keep_d))
    cand = keep & (m > low)
    strong = cand & (m > high)
    weak = cand & ~strong

    # Hysteresis: grow strong edges into 8-connected weak pixels.
    def dilate8(b):
        bp = jnp.pad(b, 1, mode="constant", constant_values=False)
        out = jnp.zeros_like(b)
        for dy_ in (-1, 0, 1):
            for dx_ in (-1, 0, 1):
                out = out | bp[1 + dy_:1 + dy_ + h, 1 + dx_:1 + dx_ + w]
        return out

    def cond(state):
        cur, changed = state
        return changed

    def body(state):
        cur, _ = state
        grown = dilate8(cur) & weak | cur
        return grown, jnp.any(grown != cur)

    edges, _ = jax.lax.while_loop(cond, body, (strong, jnp.asarray(True)))
    return jnp.where(edges, jnp.uint8(255), jnp.uint8(0))


def edge_density(gray_u8: jax.Array, low: int = 50, high: int = 150) -> jax.Array:
    e = canny(gray_u8, low, high)
    return jnp.mean((e > 0).astype(jnp.float32))
