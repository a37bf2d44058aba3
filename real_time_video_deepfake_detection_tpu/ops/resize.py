"""Image resize as jnp ops.

Two variants:
  - resize_bilinear_u8_cv2: reproduces cv2.resize(..., INTER_LINEAR) on uint8
    bit-for-bit, including OpenCV's fixed-point two-pass arithmetic
    (INTER_RESIZE_COEF_BITS=11) and its silent switch to 2x2 area averaging
    for exact 2x downscales. Needed because every forensic signal runs on
    `cv2.resize(frame, (256,256))` output (reference frame_analysis.py:71).
  - resize_bilinear_f32: float half-pixel bilinear, matching
    torch.nn.functional.interpolate(mode="bilinear", align_corners=False),
    used on the classifier path (reference deepfake_detection.py:383).

Index/coefficient tables are precomputed with numpy at trace time (shapes are
static under jit), so the device work is pure gathers + integer FMAs on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_COEF_BITS = 11
_COEF_SCALE = 1 << _COEF_BITS  # 2048


@functools.lru_cache(maxsize=None)
def _linear_tables(src: int, dst: int):
    """OpenCV's per-axis sample indices and short coefficients."""
    scale = src / dst
    x = np.arange(dst, dtype=np.float64)
    fx = (x + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx = np.where(sx < 0, 0.0, fx)
    sx = np.maximum(sx, 0)
    fx = np.where(sx >= src - 1, 0.0, fx)
    sx = np.minimum(sx, src - 1)
    # saturate_cast<short>(f * 2048) with cvRound (half-to-even)
    a1 = np.rint(np.float32(fx) * _COEF_SCALE).astype(np.int32)
    a0 = np.rint((1.0 - np.float32(fx)) * _COEF_SCALE).astype(np.int32)
    sx1 = np.minimum(sx + 1, src - 1)
    return sx, sx1, a0, a1


def resize_bilinear_u8_cv2(img: jax.Array, dst_h: int, dst_w: int) -> jax.Array:
    """cv2.resize(img, (dst_w, dst_h), interpolation=INTER_LINEAR), uint8 HWC
    (or HW), bit-exact."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    src_h, src_w = img.shape[0], img.shape[1]

    if src_h == dst_h and src_w == dst_w:
        out = img
    elif src_h == 2 * dst_h and src_w == 2 * dst_w:
        # OpenCV rewrites exact-2x INTER_LINEAR downscale to INTER_AREA fast
        # path: mean of each 2x2 block with +2 rounding (resize.cpp).
        i32 = img.astype(jnp.int32)
        s = (i32[0::2, 0::2] + i32[0::2, 1::2] + i32[1::2, 0::2] + i32[1::2, 1::2])
        out = ((s + 2) >> 2).astype(jnp.uint8)
    else:
        sx, sx1, ax0, ax1 = _linear_tables(src_w, dst_w)
        sy, sy1, ay0, ay1 = _linear_tables(src_h, dst_h)
        # Horizontal pass as a sparse one-hot matmul on the MXU (int32
        # column gathers along the minor axis are 3-4x slower on TPU):
        # rows scaled by 2^11 — a0*p + a1*q with products <= 2048*255 and
        # 2-term sums < 2^24, EXACT in f32 at HIGHEST precision.
        Wh = np.zeros((src_w, dst_w), np.float32)
        np.add.at(Wh, (sx, np.arange(dst_w)), ax0.astype(np.float32))
        np.add.at(Wh, (sx1, np.arange(dst_w)), ax1.astype(np.float32))
        h = jnp.einsum("hwc,wx->hxc", img.astype(jnp.float32),
                       jnp.asarray(Wh),
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        # Vertical pass with OpenCV's exact fixed-point cast (static row
        # gathers along the major axis are cheap):
        # uchar(((b0*(S0>>4))>>16) + ((b1*(S1>>4))>>16) + 2) >> 2
        s0 = h[sy, :, :] >> 4
        s1 = h[sy1, :, :] >> 4
        b0 = jnp.asarray(ay0)[:, None, None]
        b1 = jnp.asarray(ay1)[:, None, None]
        out = (((b0 * s0) >> 16) + ((b1 * s1) >> 16) + 2) >> 2
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)

    return out[..., 0] if squeeze else out


def _dyn_linear_tables(src_size: jax.Array, dst: int):
    """OpenCV INTER_LINEAR sample indices/coefficients for a TRACED source
    extent (used by crop_resize_u8_cv2 for device-side face crops whose box
    size is data-dependent). Arithmetic is integer-exact where the host
    tables are: sx = floor(((2x+1)*src - dst) / (2*dst)) via floor division,
    the fraction as an exact small rational cast to f32, coefficients
    rint(f * 2048) like saturate_cast<short>(cvRound(...))."""
    xs = jnp.arange(dst, dtype=jnp.int32)
    src = src_size.astype(jnp.int32)
    num = (2 * xs + 1) * src - dst          # 2*dst * fx, exactly
    den = 2 * dst
    sx = num // den                          # floor division (matches f64 floor)
    rem = num - sx * den
    f = rem.astype(jnp.float32) / jnp.float32(den)
    f = jnp.where(sx < 0, 0.0, f)
    sx = jnp.maximum(sx, 0)
    f = jnp.where(sx >= src - 1, 0.0, f)
    sx = jnp.minimum(sx, src - 1)
    a1 = jnp.rint(f * _COEF_SCALE).astype(jnp.int32)
    a0 = jnp.rint((1.0 - f) * _COEF_SCALE).astype(jnp.int32)
    sx1 = jnp.minimum(sx + 1, src - 1)
    return sx, sx1, a0, a1


def crop_resize_u8_cv2(img: jax.Array, box_xywh: jax.Array,
                       dst_h: int, dst_w: int) -> jax.Array:
    """cv2.resize(img[y:y+h, x:x+w], (dst_w, dst_h), INTER_LINEAR) with a
    TRACED (x, y, w, h) box — bit-exact vs the static-table path above,
    including the exact-2x area fast path. This is what lets face
    crop+alignment run inside the device tick (serving/batcher.py
    device-detect mode) instead of on the host per request.

    TPU layout: gathers only along the MAJOR (row) axis, where they are
    contiguous; the horizontal pass is a one-hot f32 matmul on the MXU
    (each output is a0*p + a1*q with factors <= 2048*255 and 2-term sums
    < 2^24, so f32 accumulation is EXACT — validated bit-for-bit against
    the integer path in tests/test_device_detect.py). Minor-axis dynamic
    gathers made the first version ~10 ms/tick for 64 streams; this form
    is matmul + row gathers.

    img: (H, W, C) u8; box_xywh: i32[4]. The box is assumed clamped to the
    frame (the SSD postprocess guarantees it); w/h are floored at 1."""
    x0 = box_xywh[0].astype(jnp.int32)
    y0 = box_xywh[1].astype(jnp.int32)
    w = jnp.maximum(box_xywh[2].astype(jnp.int32), 1)
    h = jnp.maximum(box_xywh[3].astype(jnp.int32), 1)
    H, W = img.shape[0], img.shape[1]
    cols = jnp.arange(W, dtype=jnp.int32)

    sx, sx1, ax0, ax1 = _dyn_linear_tables(w, dst_w)
    sy, sy1, ay0, ay1 = _dyn_linear_tables(h, dst_h)
    gx, gx1 = jnp.clip(x0 + sx, 0, W - 1), jnp.clip(x0 + sx1, 0, W - 1)
    gy, gy1 = jnp.clip(y0 + sy, 0, H - 1), jnp.clip(y0 + sy1, 0, H - 1)

    # row gathers on u8 (major axis, contiguous)
    r0 = img[gy].astype(jnp.float32)      # (dst_h, W, C)
    r1 = img[gy1].astype(jnp.float32)
    # horizontal pass as a one-hot weighted matmul: Wh[o, src] carries a0 at
    # sx[o] and a1 at sx1[o] (summed when they coincide at the clamp edge)
    Wh = (ax0.astype(jnp.float32)[:, None] * (cols[None, :] == gx[:, None])
          + ax1.astype(jnp.float32)[:, None] * (cols[None, :] == gx1[:, None]))
    h0 = jnp.einsum("hwc,xw->hxc", r0, Wh,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    h1 = jnp.einsum("hwc,xw->hxc", r1, Wh,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    # vertical combine, OpenCV's exact fixed-point cast (no gather needed:
    # h0/h1 are already the sy/sy1 rows of the horizontally-passed image)
    lin = ((((ay0[:, None, None] * (h0 >> 4)) >> 16)
            + ((ay1[:, None, None] * (h1 >> 4)) >> 16) + 2) >> 2)
    # identity boxes (w==dst_w, h==dst_h) reduce exactly under this
    # arithmetic (a0=2048: ((2048*(p*2048>>4))>>16+2)>>2 == p), so no
    # separate identity path is needed.

    # exact-2x downscale: OpenCV switches to 2x2 area averaging
    ys2 = 2 * jnp.arange(dst_h, dtype=jnp.int32)
    xs2 = 2 * jnp.arange(dst_w, dtype=jnp.int32)
    g2y = jnp.clip(y0 + ys2, 0, H - 1)
    g2y1 = jnp.clip(y0 + ys2 + 1, 0, H - 1)
    g2x = jnp.clip(x0 + xs2, 0, W - 1)
    g2x1 = jnp.clip(x0 + xs2 + 1, 0, W - 1)
    a0 = img[g2y].astype(jnp.float32) + img[g2y1].astype(jnp.float32)
    W2 = ((cols[None, :] == g2x[:, None]).astype(jnp.float32)
          + (cols[None, :] == g2x1[:, None]).astype(jnp.float32))
    blk = jnp.einsum("hwc,xw->hxc", a0, W2,
                     precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    area = (blk + 2) >> 2

    is_2x = (h == 2 * dst_h) & (w == 2 * dst_w)
    out = jnp.where(is_2x, area, lin)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _linear_tables_f32(src: int, dst: int):
    scale = src / dst
    x = np.arange(dst, dtype=np.float64)
    fx = (x + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx = np.where(sx < 0, 0.0, fx)
    sx = np.maximum(sx, 0)
    fx = np.where(sx >= src - 1, 0.0, fx)
    sx = np.minimum(sx, src - 1)
    sx1 = np.minimum(sx + 1, src - 1)
    return sx, sx1, (1.0 - fx).astype(np.float32), fx.astype(np.float32)


def resize_bilinear_f32(img: jax.Array, dst_h: int, dst_w: int) -> jax.Array:
    """Float bilinear with half-pixel centers, edge-clamped — matches
    torch F.interpolate(mode='bilinear', align_corners=False). Input HWC or
    CHW-agnostic: operates on the first two axes."""
    src_h, src_w = img.shape[0], img.shape[1]
    sx, sx1, ax0, ax1 = _linear_tables_f32(src_w, dst_w)
    sy, sy1, ay0, ay1 = _linear_tables_f32(src_h, dst_h)
    x = img.astype(jnp.float32)
    extra = (1,) * (img.ndim - 2)
    h = x[:, sx] * jnp.asarray(ax0).reshape(1, -1, *extra) + \
        x[:, sx1] * jnp.asarray(ax1).reshape(1, -1, *extra)
    out = h[sy] * jnp.asarray(ay0).reshape(-1, 1, *extra) + \
          h[sy1] * jnp.asarray(ay1).reshape(-1, 1, *extra)
    return out
