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


# ------------------------------------------------------------- CIELAB (u8)
#
# cv2 COLOR_BGR2LAB/LAB2BGR float math (D65, sRGB gamma), matching the
# native C implementation (native/ingest.cpp bgr_to_lab_u8) within the same
# +-2 LSB tolerance documented there. Used by the device-side CLAHE option
# (serving/batcher.py): faces are RGB on device, so these take RGB order.

_LAB_XN = 0.950456
_LAB_ZN = 1.088754


def _srgb_to_linear(c: jax.Array) -> jax.Array:
    return jnp.where(c <= 0.04045, c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))


def _linear_to_srgb(c: jax.Array) -> jax.Array:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, 12.92 * c,
                     1.055 * jnp.power(c, 1.0 / 2.4) - 0.055)


def _lab_f(t: jax.Array) -> jax.Array:
    return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _q_u8(v: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(v), 0, 255).astype(jnp.uint8)


def rgb_to_lab_u8(rgb_u8: jax.Array) -> jax.Array:
    """(..., 3) u8 RGB -> (..., 3) u8 Lab (L scaled *255/100, a/b +128)."""
    lin = _srgb_to_linear(rgb_u8.astype(jnp.float32) / 255.0)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    x = (0.412453 * r + 0.357580 * g + 0.180423 * b) / _LAB_XN
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / _LAB_ZN
    fy = _lab_f(y)
    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (_lab_f(x) - fy) + 128.0
    bb = 200.0 * (fy - _lab_f(z)) + 128.0
    return jnp.stack([_q_u8(L * 255.0 / 100.0), _q_u8(a), _q_u8(bb)], axis=-1)


def lab_to_rgb_u8(lab_u8: jax.Array) -> jax.Array:
    lab = lab_u8.astype(jnp.float32)
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    bb = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - bb / 200.0

    def finv(t):
        t3 = t * t * t
        return jnp.where(t3 > 0.008856, t3, (t - 16.0 / 116.0) / 7.787)

    y = jnp.where(L > 8.0, fy * fy * fy, L / 903.3)
    x = finv(fx) * _LAB_XN
    z = finv(fz) * _LAB_ZN
    r = 3.240479 * x - 1.537150 * y - 0.498535 * z
    g = -0.969256 * x + 1.875991 * y + 0.041556 * z
    b = 0.055648 * x - 0.204043 * y + 1.057311 * z
    to8 = lambda c: _q_u8(_linear_to_srgb(c) * 255.0)
    return jnp.stack([to8(r), to8(g), to8(b)], axis=-1)
