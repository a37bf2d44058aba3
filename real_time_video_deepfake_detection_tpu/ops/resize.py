"""Image resize as jnp ops.

Two variants:
  - resize_bilinear_u8_cv2: reproduces cv2.resize(..., INTER_LINEAR) on uint8
    bit-for-bit FOR DOWNSCALE/IDENTITY (every reference call site: 640x480
    capture -> 256x256 forensic conform, frame_analysis.py:71, and -> 300x300
    SSD conform, face_detection.py:77), including OpenCV's fixed-point
    two-pass arithmetic (INTER_RESIZE_COEF_BITS=11, f32 residual positions)
    and its silent switch to 2x2 area averaging for exact 2x downscales.
    For UPSCALE (both axes growing — reached only by sub-224 face crops in
    our own device aligner, never by a reference path), OpenCV >= 4.x
    dispatches a separate fixed-point 8U kernel whose edge rows carry
    per-row rounding jitter; we keep the classic kernel everywhere, which
    matches it within 1 LSB on < 1% of pixels (measured; see docs/DESIGN.md
    "Known numeric deviations" and tests/test_device_detect.py).
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

# u8-input fast path of resize_bilinear_f32 (one-hot matmul horizontal
# taps). Bit-identical either way; a module flag rather than config because
# it is a pure scheduling choice, A/B-able per deployment (tools/tick_ab.py
# measures it inside the fused serving tick, where MXU/VPU port balance —
# not isolated stage time — decides).
U8_MATMUL_HPASS = True

# h-pass P/Q contraction dataflow: True = one matmul with concatenated
# one-hot columns (image operand read once), False = two separate matmuls.
# Bit-identical either way (each output column is the same single-nonzero
# contraction); A/B'd on silicon by tools/roofline_probe.py (round 5).
HPASS_FUSED_PQ = False


@functools.lru_cache(maxsize=None)
def _linear_tables(src: int, dst: int):
    """OpenCV's per-axis sample indices and short coefficients.

    The residual is FLOAT32 end-to-end, exactly as resize.cpp computes it:
    `fxx = (float)((dx+0.5)*scale_x - 0.5); sx = cvFloor(fxx); fxx -= sx;`
    — computing it in f64 and casting late changes the rounded coefficient
    on ~3% of columns for e.g. 640->300 (found by a round-5 verify drive;
    the old golden shapes 640->256 etc. happened to agree either way)."""
    scale = src / dst
    x = np.arange(dst, dtype=np.float64)
    fx = np.float32((x + 0.5) * scale - 0.5)   # double product, f32 cast
    sx = np.floor(fx).astype(np.int64)
    fx = (fx - sx.astype(np.float32)).astype(np.float32)
    fx = np.where(sx < 0, np.float32(0), fx)
    sx = np.maximum(sx, 0)
    fx = np.where(sx >= src - 1, np.float32(0), fx)
    sx = np.minimum(sx, src - 1)
    # saturate_cast<short>(f * 2048) with cvRound (half-to-even)
    a1 = np.rint(fx * np.float32(_COEF_SCALE)).astype(np.int32)
    a0 = np.rint((np.float32(1) - fx) * np.float32(_COEF_SCALE)).astype(np.int32)
    sx1 = np.minimum(sx + 1, src - 1)
    return sx, sx1, a0, a1



def _mm_dtype():
    """Matmul input dtype for the one-hot passes: bf16 on TPU (single MXU
    pass; exact for one-hot x u8 with f32 accumulation), f32 elsewhere
    (CPU XLA has no bf16 x bf16 -> f32 dot; f32 is exact there anyway)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


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
        # Horizontal pass on the MXU via two ONE-HOT bf16 matmuls with f32
        # accumulation (single-pass; int32 minor-axis column gathers are
        # 3-4x slower on TPU, and a weighted-coefficient matmul would need
        # 6-pass HIGHEST f32). One-hot entries and u8 pixels are exact in
        # bf16, each output row sums one term, so P and Q are exact; the
        # 2^11-scaled row a0*P + a1*Q then forms in exact int32. (a0 and a1
        # are rounded independently by OpenCV and do not always sum to
        # 2048, so both must be applied.)
        Wp = np.zeros((src_w, dst_w), np.float32)
        Wq = np.zeros((src_w, dst_w), np.float32)
        Wp[sx, np.arange(dst_w)] = 1.0
        Wq[sx1, np.arange(dst_w)] = 1.0
        mmt = _mm_dtype()
        imgb = img.astype(mmt)
        # P and Q in ONE matmul (columns [Wp | Wq]) when HPASS_FUSED_PQ:
        # each output column is the same single-nonzero contraction either
        # way, so bit-exactness is untouched; fused reads the image once
        # P/Q hold SELECTED PIXELS (one term per output), so they fit i16;
        # and the vertical pass only ever consumes h >> 4 <= 32640, so the
        # row-gathered intermediate fits i16 too. Materializing both at 16
        # bits halves the resize's HBM traffic (the 300^2/256^2 conform
        # vertical gathers were the tick's heaviest gather bytes in the
        # round-5 roofline trace) — bit-exact: (a0*P + a1*Q) >> 4 is the
        # same integer whether the shift happens before or after the
        # gather, and every value fits its narrow type exactly.
        if HPASS_FUSED_PQ:
            PQ = jnp.einsum(
                "hwc,wx->hxc", imgb,
                jnp.asarray(np.concatenate([Wp, Wq], 1)).astype(mmt),
                preferred_element_type=jnp.float32).astype(jnp.int16)
            P, Q = PQ[:, :dst_w], PQ[:, dst_w:]
        else:
            P = jnp.einsum("hwc,wx->hxc", imgb, jnp.asarray(Wp).astype(mmt),
                           preferred_element_type=jnp.float32).astype(jnp.int16)
            Q = jnp.einsum("hwc,wx->hxc", imgb, jnp.asarray(Wq).astype(mmt),
                           preferred_element_type=jnp.float32).astype(jnp.int16)
        h16 = ((jnp.asarray(ax0)[None, :, None] * P.astype(jnp.int32)
                + jnp.asarray(ax1)[None, :, None] * Q.astype(jnp.int32))
               >> 4).astype(jnp.int16)
        # Vertical pass with OpenCV's exact fixed-point cast (static row
        # gathers along the major axis, now on i16 rows):
        # uchar(((b0*(S0>>4))>>16) + ((b1*(S1>>4))>>16) + 2) >> 2
        s0 = h16[sy, :, :].astype(jnp.int32)
        s1 = h16[sy1, :, :].astype(jnp.int32)
        b0 = jnp.asarray(ay0)[:, None, None]
        b1 = jnp.asarray(ay1)[:, None, None]
        out = (((b0 * s0) >> 16) + ((b1 * s1) >> 16) + 2) >> 2
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)

    return out[..., 0] if squeeze else out


@functools.lru_cache(maxsize=None)
def _dyn_f32_tables(dst: int, src_max: int):
    """Stacked per-source-extent tables for the dynamic (traced-extent)
    path: row `src` holds _linear_tables(src, dst), i.e. cv2's EXACT
    f32-residual indices/coefficients for that extent. The device gathers
    one row by the traced extent — no device-side float math at all
    (TPU f32 division is reciprocal-based, not IEEE-rounded), and the
    dynamic path stays bit-identical to the static one for every extent.
    (Until round 5 this was a rational-remainder lookup, which matched
    f64 positions — but cv2 computes positions in f32, which flips the
    rounded Q11 coefficient on up to a few % of columns per extent.)"""
    shape = (src_max + 1, dst)
    sx_t = np.zeros(shape, np.int32)
    sx1_t = np.zeros(shape, np.int32)
    a0_t = np.zeros(shape, np.int32)
    a1_t = np.zeros(shape, np.int32)
    for src in range(1, src_max + 1):
        sx, sx1, a0, a1 = _linear_tables(src, dst)
        sx_t[src], sx1_t[src], a0_t[src], a1_t[src] = sx, sx1, a0, a1
    # extent 0 cannot occur (crop w/h are floored at 1); mirror row 1 so
    # the gather is total anyway
    sx_t[0], sx1_t[0], a0_t[0], a1_t[0] = sx_t[1], sx1_t[1], a0_t[1], a1_t[1]
    return sx_t, sx1_t, a0_t, a1_t


def _dyn_linear_tables(src_size: jax.Array, dst: int, src_max: int = 640):
    """OpenCV INTER_LINEAR sample indices/coefficients for a TRACED source
    extent (used by crop_resize_u8_cv2 for device-side face crops whose box
    size is data-dependent): a single row gather from the host-precomputed
    per-extent tables above. Extents beyond src_max clamp to src_max
    (callers pass the enclosing image dimension, which bounds any crop)."""
    tabs = _dyn_f32_tables(dst, src_max)
    i = jnp.clip(src_size.astype(jnp.int32), 0, src_max)
    sx, sx1, a0, a1 = (jnp.asarray(t)[i] for t in tabs)
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

    sx, sx1, ax0, ax1 = _dyn_linear_tables(w, dst_w, int(W))
    sy, sy1, ay0, ay1 = _dyn_linear_tables(h, dst_h, int(H))
    gx, gx1 = jnp.clip(x0 + sx, 0, W - 1), jnp.clip(x0 + sx1, 0, W - 1)
    gy, gy1 = jnp.clip(y0 + sy, 0, H - 1), jnp.clip(y0 + sy1, 0, H - 1)

    # row gathers on u8 (major axis, contiguous)
    mmt = _mm_dtype()
    r0 = img[gy].astype(mmt)      # (dst_h, W, C) — u8 exact in bf16
    r1 = img[gy1].astype(mmt)
    # Horizontal pass via one-hot bf16 matmuls with f32 accumulation
    # (single MXU pass, exact: one-hot entries x u8 pixels, one term per
    # output), then the 2^11-scaled row a0*P + a1*Q in exact int32
    # P and Q stacked into ONE matmul (rows [Wp ; Wq]) when HPASS_FUSED_PQ
    # so each gathered row image is read once, not twice — same
    # single-nonzero contractions, bit-exactness untouched either way
    Wp_ = (cols[None, :] == gx[:, None]).astype(mmt)
    Wq_ = (cols[None, :] == gx1[:, None]).astype(mmt)
    Wpq = jnp.concatenate([Wp_, Wq_], axis=0)

    def hpass_pq(r):
        # P/Q are selected pixels (<= 255) and the vertical pass consumes
        # only h >> 4 (<= 32640), so both intermediates materialize as i16
        # — half the HBM bytes, bit-exact (see the static path's note)
        if HPASS_FUSED_PQ:
            PQ = jnp.einsum("hwc,xw->hxc", r, Wpq,
                            preferred_element_type=jnp.float32).astype(jnp.int16)
            return PQ[:, :dst_w], PQ[:, dst_w:]
        P = jnp.einsum("hwc,xw->hxc", r, Wp_,
                       preferred_element_type=jnp.float32).astype(jnp.int16)
        Q = jnp.einsum("hwc,xw->hxc", r, Wq_,
                       preferred_element_type=jnp.float32).astype(jnp.int16)
        return P, Q

    P0, Q0 = hpass_pq(r0)
    P1, Q1 = hpass_pq(r1)

    def lin_h(P, Q):
        return ((ax0[None, :, None] * P.astype(jnp.int32)
                 + ax1[None, :, None] * Q.astype(jnp.int32)) >> 4)

    # vertical combine, OpenCV's exact fixed-point cast (no gather needed:
    # h0/h1 are already the sy/sy1 rows of the horizontally-passed image)
    lin = ((((ay0[:, None, None] * lin_h(P0, Q0)) >> 16)
            + ((ay1[:, None, None] * lin_h(P1, Q1)) >> 16) + 2) >> 2)
    # identity boxes (w==dst_w, h==dst_h) reduce exactly under this
    # arithmetic (a0=2048: ((2048*(p*2048>>4))>>16+2)>>2 == p), so no
    # separate identity path is needed.

    # exact-2x downscale: OpenCV switches to 2x2 area averaging. For
    # src == 2*dst the general tables already select EXACTLY the four
    # area-path taps (sy = 2i, sy1 = 2i+1, gx = x0+2j, gx1 = x0+2j+1 —
    # fx = 0.5 everywhere, no edge clamping for an in-frame box), so the
    # area mean reuses the SAME P/Q matmul outputs — no second set of row
    # gathers and one-hot contractions (they were 2 of the tick's 4 crop
    # gathers in the round-5 roofline trace; the where() evaluates both
    # branches, so the dead branch's gathers were always paid).
    area = (P0.astype(jnp.int32) + Q0.astype(jnp.int32)
            + P1.astype(jnp.int32) + Q1.astype(jnp.int32) + 2) >> 2

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
    CHW-agnostic: operates on the first two axes.

    uint8 input takes a bit-identical fast path: the horizontal gathers
    (minor-axis — slow on TPU) become one-hot bf16 matmuls, exact because
    u8 values are bf16-exact and each one-hot row has a single term; the
    f32 coefficient combines are then the same operations in the same order
    as the gather form."""
    src_h, src_w = img.shape[0], img.shape[1]
    sx, sx1, ax0, ax1 = _linear_tables_f32(src_w, dst_w)
    sy, sy1, ay0, ay1 = _linear_tables_f32(src_h, dst_h)
    extra = (1,) * (img.ndim - 2)
    if U8_MATMUL_HPASS and img.dtype == jnp.uint8 and img.ndim == 3:
        Wp = np.zeros((src_w, dst_w), np.float32)
        Wq = np.zeros((src_w, dst_w), np.float32)
        Wp[sx, np.arange(dst_w)] = 1.0
        Wq[sx1, np.arange(dst_w)] = 1.0
        mmt = _mm_dtype()
        xb = img.astype(mmt)
        P = jnp.einsum("hwc,wx->hxc", xb, jnp.asarray(Wp).astype(mmt),
                       preferred_element_type=jnp.float32)
        Q = jnp.einsum("hwc,wx->hxc", xb, jnp.asarray(Wq).astype(mmt),
                       preferred_element_type=jnp.float32)
    else:
        x = img.astype(jnp.float32)
        P, Q = x[:, sx], x[:, sx1]
    h = P * jnp.asarray(ax0).reshape(1, -1, *extra) + \
        Q * jnp.asarray(ax1).reshape(1, -1, *extra)
    out = h[sy] * jnp.asarray(ay0).reshape(-1, 1, *extra) + \
          h[sy1] * jnp.asarray(ay1).reshape(-1, 1, *extra)
    return out
