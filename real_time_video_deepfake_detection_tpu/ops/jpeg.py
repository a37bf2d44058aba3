"""JPEG quality-90 re-compression round-trip as jnp ops (for ELA).

The reference ELA signal re-encodes the frame as JPEG q90 and measures the
recompression error (frame_analysis.py:227-276: cv2.imencode/imdecode). The
entropy-coding stage is lossless, so the full error is produced by the DCT
quantization chain. This module reproduces libjpeg's *integer* pipeline
bit-for-bit so the ELA signal matches cv2 exactly without any host codec:

  BGR -> YCbCr (libjpeg fixed-point, SCALEBITS=16)
  -> 4:2:0 chroma downsample (h2v2, alternating +1/+2 bias)
  -> 8x8 islow forward DCT (jfdctint.c, CONST_BITS=13/PASS1_BITS=2)
  -> quantize with IJG standard tables scaled to quality 90
  -> dequantize -> islow inverse DCT (jddctint.c)
  -> h2v2 "fancy" (triangular) chroma upsample
  -> YCbCr -> BGR (libjpeg fixed-point) -> clamp u8

Everything is int32 arithmetic on (N, 8, 8) block stacks — pure VPU work on
TPU, trivially batched. Requires H, W divisible by 16 (always true for the
256x256 analysis frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- quant tables
_STD_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int32)

_STD_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.int32)


@functools.lru_cache(maxsize=None)
def quant_table(quality: int, chroma: bool) -> np.ndarray:
    """jpeg_quality_scaling + jpeg_add_quant_table (force_baseline)."""
    if quality < 50:
        scale = 5000 // quality
    else:
        scale = 200 - quality * 2
    base = _STD_CHROM if chroma else _STD_LUM
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


# ------------------------------------------------------------- islow DCT pair
_CONST_BITS = 13
_PASS1_BITS = 2
F_0_298631336 = 2446
F_0_390180644 = 3196
F_0_541196100 = 4433
F_0_765366865 = 6270
F_0_899976223 = 7373
F_1_175875602 = 9633
F_1_501321110 = 12299
F_1_847759065 = 15137
F_1_961570560 = 16069
F_2_053119869 = 16819
F_2_562915447 = 20995
F_3_072711026 = 25172


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


def _fdct_1d(d, shift_out: int):
    """One islow FDCT pass over 8 lanes. d: tuple of 8 int32 arrays.
    shift_out: PASS1 pass uses <<PASS1_BITS for evens / descale
    CONST_BITS-PASS1_BITS; final pass uses descale(.., PASS1_BITS) for evens /
    CONST_BITS+PASS1_BITS for odds."""
    d0, d1, d2, d3, d4, d5, d6, d7 = d
    tmp0, tmp7 = d0 + d7, d0 - d7
    tmp1, tmp6 = d1 + d6, d1 - d6
    tmp2, tmp5 = d2 + d5, d2 - d5
    tmp3, tmp4 = d3 + d4, d3 - d4

    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2

    if shift_out == 1:   # pass 1
        o0 = (tmp10 + tmp11) << _PASS1_BITS
        o4 = (tmp10 - tmp11) << _PASS1_BITS
        dshift = _CONST_BITS - _PASS1_BITS
    else:                # pass 2
        o0 = _descale(tmp10 + tmp11, _PASS1_BITS)
        o4 = _descale(tmp10 - tmp11, _PASS1_BITS)
        dshift = _CONST_BITS + _PASS1_BITS

    z1 = (tmp12 + tmp13) * F_0_541196100
    o2 = _descale(z1 + tmp13 * F_0_765366865, dshift)
    o6 = _descale(z1 - tmp12 * F_1_847759065, dshift)

    z1 = tmp4 + tmp7
    z2 = tmp5 + tmp6
    z3 = tmp4 + tmp6
    z4 = tmp5 + tmp7
    z5 = (z3 + z4) * F_1_175875602

    t4 = tmp4 * F_0_298631336
    t5 = tmp5 * F_2_053119869
    t6 = tmp6 * F_3_072711026
    t7 = tmp7 * F_1_501321110
    z1 = z1 * (-F_0_899976223)
    z2 = z2 * (-F_2_562915447)
    z3 = z3 * (-F_1_961570560) + z5
    z4 = z4 * (-F_0_390180644) + z5

    o7 = _descale(t4 + z1 + z3, dshift)
    o5 = _descale(t5 + z2 + z4, dshift)
    o3 = _descale(t6 + z2 + z3, dshift)
    o1 = _descale(t7 + z1 + z4, dshift)
    return o0, o1, o2, o3, o4, o5, o6, o7


def fdct_islow(blocks: jax.Array) -> jax.Array:
    """jpeg_fdct_islow over (8, 8, N) level-shifted int32 samples (lane-major:
    the block index rides the last — TPU lane — axis so every scalar of the
    8x8 integer DCT vectorizes over all blocks; the (N, 8, 8) layout left 120
    of 128 lanes idle). Output is the DCT scaled by 8 (libjpeg convention)."""
    x = blocks.astype(jnp.int32)
    rows = _fdct_1d(tuple(x[:, i, :] for i in range(8)), shift_out=1)
    x = jnp.stack(rows, axis=1)            # (8, 8, N) after row pass
    cols = _fdct_1d(tuple(x[i, :, :] for i in range(8)), shift_out=2)
    return jnp.stack(cols, axis=0)         # back to (8, 8, N)


def _idct_1d(d, pass2: bool):
    d0, d1, d2, d3, d4, d5, d6, d7 = d
    z2, z3 = d2, d6
    z1 = (z2 + z3) * F_0_541196100
    tmp2 = z1 + z3 * (-F_1_847759065)
    tmp3 = z1 + z2 * F_0_765366865

    z2, z3 = d0, d4
    tmp0 = (z2 + z3) << _CONST_BITS
    tmp1 = (z2 - z3) << _CONST_BITS

    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2

    t0, t1, t2, t3 = d7, d5, d3, d1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * F_1_175875602

    t0 = t0 * F_0_298631336
    t1 = t1 * F_2_053119869
    t2 = t2 * F_3_072711026
    t3 = t3 * F_1_501321110
    z1 = z1 * (-F_0_899976223)
    z2 = z2 * (-F_2_562915447)
    z3 = z3 * (-F_1_961570560) + z5
    z4 = z4 * (-F_0_390180644) + z5

    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    shift = (_CONST_BITS + _PASS1_BITS + 3) if pass2 else (_CONST_BITS - _PASS1_BITS)
    o0 = _descale(tmp10 + t3, shift)
    o7 = _descale(tmp10 - t3, shift)
    o1 = _descale(tmp11 + t2, shift)
    o6 = _descale(tmp11 - t2, shift)
    o2 = _descale(tmp12 + t1, shift)
    o5 = _descale(tmp12 - t1, shift)
    o3 = _descale(tmp13 + t0, shift)
    o4 = _descale(tmp13 - t0, shift)
    return o0, o1, o2, o3, o4, o5, o6, o7


def idct_islow(coefs: jax.Array) -> jax.Array:
    """jpeg_idct_islow over (8, 8, N) dequantized int32 coefficients
    (lane-major, see fdct_islow). Returns centered samples (add 128 and
    clamp for u8)."""
    x = coefs.astype(jnp.int32)
    cols = _idct_1d(tuple(x[i, :, :] for i in range(8)), pass2=False)
    x = jnp.stack(cols, axis=0)
    rows = _idct_1d(tuple(x[:, i, :] for i in range(8)), pass2=True)
    return jnp.stack(rows, axis=1)


# --------------------------------------------------------------- color convert
_SCALEBITS = 16
_ONE_HALF = 1 << (_SCALEBITS - 1)
_CBCR_OFFSET = 128 << _SCALEBITS


def _fix(x: float) -> int:
    return int(x * (1 << _SCALEBITS) + 0.5)


def bgr_to_ycbcr_jpeg(bgr: jax.Array):
    """libjpeg rgb_ycc_convert (jccolor.c), bit-exact. Returns (y, cb, cr) u8."""
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    y = (_fix(0.29900) * r + _fix(0.58700) * g + _fix(0.11400) * b
         + _ONE_HALF) >> _SCALEBITS
    cb = (-_fix(0.16874) * r - _fix(0.33126) * g + _fix(0.50000) * b
          + _CBCR_OFFSET + _ONE_HALF - 1) >> _SCALEBITS
    cr = (_fix(0.50000) * r - _fix(0.41869) * g - _fix(0.08131) * b
          + _CBCR_OFFSET + _ONE_HALF - 1) >> _SCALEBITS
    return y, cb, cr


def ycbcr_to_bgr_jpeg(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """libjpeg ycc_rgb_convert (jdcolor.c), bit-exact, clamped u8 BGR."""
    yi = y.astype(jnp.int32)
    cbi = cb.astype(jnp.int32) - 128
    cri = cr.astype(jnp.int32) - 128
    r = yi + ((_fix(1.40200) * cri + _ONE_HALF) >> _SCALEBITS)
    b = yi + ((_fix(1.77200) * cbi + _ONE_HALF) >> _SCALEBITS)
    g = yi + ((-_fix(0.34414) * cbi + (-_fix(0.71414)) * cri
               + _ONE_HALF - 1) >> _SCALEBITS)
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# ------------------------------------------------------------------ resampling
def h2v2_downsample(c: jax.Array) -> jax.Array:
    """libjpeg h2v2_downsample: 2x2 mean with per-column alternating +1/+2
    bias (jcsample.c)."""
    h, w = c.shape
    s = (c[0::2, 0::2].astype(jnp.int32) + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
    bias = jnp.where(jnp.arange(w // 2) % 2 == 0, 1, 2)[None, :]
    return ((s + bias) >> 2).astype(jnp.int32)


def h2v2_fancy_upsample(c: jax.Array) -> jax.Array:
    """libjpeg h2v2_fancy_upsample (jdsample.c): triangular filter, bit-exact.
    Input (h, w) int32 chroma plane, output (2h, 2w)."""
    h, w = c.shape
    ci = c.astype(jnp.int32)
    up = jnp.concatenate([ci[:1], ci[:-1]], axis=0)      # row above, clamped
    down = jnp.concatenate([ci[1:], ci[-1:]], axis=0)    # row below, clamped

    def expand_row(colsum):
        # colsum: (rows, w) vertical 3:1 sums; horizontal triangular expand.
        left = jnp.concatenate([colsum[:, :1], colsum[:, :-1]], axis=1)
        right = jnp.concatenate([colsum[:, 1:], colsum[:, -1:]], axis=1)
        even = (colsum * 3 + left + 8) >> 4
        odd = (colsum * 3 + right + 7) >> 4
        # First output col: (colsum*4 + 8) >> 4; last: (colsum*4 + 7) >> 4
        even = even.at[:, 0].set((colsum[:, 0] * 4 + 8) >> 4)
        odd = odd.at[:, -1].set((colsum[:, -1] * 4 + 7) >> 4)
        out = jnp.stack([even, odd], axis=-1).reshape(colsum.shape[0], -1)
        return out

    even_rows = expand_row(ci * 3 + up)      # output rows 0,2,4,...
    odd_rows = expand_row(ci * 3 + down)     # output rows 1,3,5,...
    out = jnp.stack([even_rows, odd_rows], axis=1).reshape(2 * h, 2 * w)
    return out


# ------------------------------------------------------------------- blockify
def _to_blocks(plane: jax.Array) -> jax.Array:
    """(h, w) -> (8, 8, n_blocks) lane-major blocks (see fdct_islow)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(1, 3, 0, 2).reshape(8, 8, -1)


def _from_blocks(blocks: jax.Array, h: int, w: int) -> jax.Array:
    return blocks.reshape(8, 8, h // 8, w // 8).transpose(2, 0, 3, 1).reshape(h, w)


def _roundtrip_plane(plane: jax.Array, qtab) -> jax.Array:
    """plane (int32, JSAMPLE range) -> DCT-quantize-IDCT -> int32 samples.
    `qtab` may be a static numpy table or a traced (8,8) int32 array (the
    device-side JPEG augmentation passes per-sample tables)."""
    h, w = plane.shape
    blocks = _to_blocks(plane.astype(jnp.int32) - 128)
    dct = fdct_islow(blocks)
    qt = jnp.asarray(qtab)[:, :, None]   # broadcast over the lane axis
    q = qt << 3          # divisors are qval*8 (jcdctmgr.c)
    # quantize: round-half-away division
    a = jnp.abs(dct)
    quant = jnp.sign(dct) * ((a + (q >> 1)) // q)
    deq = quant * qt
    spatial = idct_islow(deq) + 128
    spatial = jnp.clip(spatial, 0, 255)
    return _from_blocks(spatial, h, w)


def jpeg_roundtrip_bgr_tables(bgr: jax.Array, qlum, qchr) -> jax.Array:
    """JPEG round-trip with explicit (8,8) quant tables (static or traced)."""
    y, cb, cr = bgr_to_ycbcr_jpeg(bgr)
    y2 = _roundtrip_plane(y, qlum)
    cb2 = _roundtrip_plane(h2v2_downsample(cb), qchr)
    cr2 = _roundtrip_plane(h2v2_downsample(cr), qchr)
    cb_up = h2v2_fancy_upsample(cb2)
    cr_up = h2v2_fancy_upsample(cr2)
    return ycbcr_to_bgr_jpeg(y2, cb_up, cr_up)


def jpeg_roundtrip_bgr(bgr: jax.Array, quality: int = 90) -> jax.Array:
    """Encode+decode a BGR u8 image at the given JPEG quality (4:2:0,
    baseline, libjpeg defaults) — equivalent to
    cv2.imdecode(cv2.imencode('.jpg', img, [IMWRITE_JPEG_QUALITY, q])[1]).
    H and W must be divisible by 16."""
    return jpeg_roundtrip_bgr_tables(
        bgr, quant_table(quality, chroma=False), quant_table(quality, chroma=True))


def quality_table_stack(q_lo: int, q_hi: int):
    """(Nq, 8, 8) luma and chroma tables for qualities q_lo..q_hi inclusive —
    indexable on device for per-sample JPEG augmentation."""
    lum = np.stack([quant_table(q, False) for q in range(q_lo, q_hi + 1)])
    chr_ = np.stack([quant_table(q, True) for q in range(q_lo, q_hi + 1)])
    return lum, chr_
