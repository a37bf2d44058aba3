"""Color-space conversions as jnp ops, bit-matched to OpenCV's u8 paths.

The forensic signals (reference frame_analysis.py) and preprocessing chain
consume cv2.cvtColor outputs; score parity within 1e-3 requires reproducing
OpenCV's fixed-point integer arithmetic, not the textbook float formulas.
All functions take HWC BGR uint8 (OpenCV's layout) and are vmap-able.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV BGR2GRAY fixed-point coefficients: R*0.299 + G*0.587 + B*0.114
# scaled by 2^15 (verified bit-exact vs cv2 5.0; the older 2^14 table is off
# by 1 LSB on ~0.3% of pixels).
_GRAY_SHIFT = 15
_R_COEF, _G_COEF, _B_COEF = 9798, 19235, 3735  # round(c * 2^15)


def bgr_to_gray_u8(bgr: jax.Array) -> jax.Array:
    """cv2.cvtColor(frame, COLOR_BGR2GRAY) for uint8 input, bit-exact."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (r * _R_COEF + g * _G_COEF + b * _B_COEF + (1 << (_GRAY_SHIFT - 1))) >> _GRAY_SHIFT
    return y.astype(jnp.uint8)


def bgr_to_gray_f32(bgr: jax.Array) -> jax.Array:
    """gray-u8 then .astype(float32) — the pattern the forensic signals use
    (frame_analysis.py:136,188,356)."""
    return bgr_to_gray_u8(bgr).astype(jnp.float32)


# OpenCV BGR2HSV for u8: integer algorithm with 12-bit division tables
# (imgproc color_hsv: hsv_shift=12, sdiv/hdiv tables).
_HSV_SHIFT = 12


def _make_hsv_tables():
    sdiv = np.zeros(256, np.int32)
    hdiv = np.zeros(256, np.int32)
    sdiv[1:] = np.floor((255 << _HSV_SHIFT) / np.arange(1, 256) + 0.5).astype(np.int32)
    hdiv[1:] = np.floor((180 << _HSV_SHIFT) / (6.0 * np.arange(1, 256)) + 0.5).astype(np.int32)
    return sdiv, hdiv


_SDIV_TABLE, _HDIV_TABLE = _make_hsv_tables()


def bgr_to_hsv_u8(bgr: jax.Array) -> jax.Array:
    """cv2.cvtColor(frame, COLOR_BGR2HSV) for uint8, bit-exact.
    H in [0,180), S,V in [0,255].

    OpenCV uses 12-bit division LUTs; here the LUT entries are computed
    arithmetically per pixel (round((K<<12)/x) == (2*(K<<12)+x)//(2x),
    verified exactly over the full domain) because TPU gathers of the LUTs
    measured ~70 ms for a 64-frame batch — elementwise integer division
    lowers to fast VPU code instead."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)

    v = jnp.maximum(jnp.maximum(b, g), r)
    vmin = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - vmin

    half = 1 << (_HSV_SHIFT - 1)
    sdiv_v = jnp.where(
        v > 0, (2 * (255 << _HSV_SHIFT) + v) // jnp.maximum(2 * v, 1), 0)
    s = (diff * sdiv_v + half) >> _HSV_SHIFT

    # OpenCV picks the hue branch with bitmask selects in this priority:
    # v==r -> g-b; elif v==g -> b-r+2*diff; else r-g+4*diff.
    vr = v == r
    vg = v == g
    h_raw = jnp.where(vr, g - b, jnp.where(vg, b - r + 2 * diff, r - g + 4 * diff))
    hdiv_d = jnp.where(
        diff > 0,
        (2 * (180 << _HSV_SHIFT) + 6 * diff) // jnp.maximum(12 * diff, 1), 0)
    h = (h_raw * hdiv_d + half) >> _HSV_SHIFT
    h = jnp.where(h < 0, h + 180, h)

    return jnp.stack([h, s, v], axis=-1).astype(jnp.uint8)
