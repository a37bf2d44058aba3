"""Device-side JPEG reconstruction from wire-format ingest planes.

The serving frontend can split the JPEG codec across host and device at two
natural boundaries instead of fully decoding on the host like the reference
(backend_server.py:140-142, cv2.imdecode on every request):

  "coef"      the host does the Huffman/entropy decode ONLY
              (native/ingest.cpp ingest_decode_coefs_batch) and ships
              quantized DCT coefficients + quant tables; this module runs
              dequant -> islow IDCT -> h2v2 fancy upsample -> YCbCr->BGR on
              device. Host cost collapses to the memory-bound entropy scan.
  "ycbcr420"  the host also runs the IDCT but ships raw 4:2:0 planes
              (1.5 B/px vs BGR's 3 B/px — halves host->device traffic);
              this module runs upsample + color conversion only.

Both reconstructions are BIT-EXACT vs libjpeg's full host decode with its
defaults (jpeg_idct_islow, do_fancy_upsampling, ycc_rgb_convert): the math
here is the same integer pipeline ops/jpeg.py already uses for the ELA
signal, asserted against the native decoder in tests/test_jpeg_wire.py.

All shapes static: capture (h, w) divisible by 16; the batch axis rides the
TPU lane dimension through the 8x8 IDCT (see ops/jpeg.fdct_islow note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .jpeg import h2v2_fancy_upsample, idct_islow, ycbcr_to_bgr_jpeg


def _blocks_to_plane_batch(samples: jax.Array, h: int, w: int) -> jax.Array:
    """(B, n_blocks, 64) spatial samples (block raster order, natural 8x8
    layout) -> (B, h, w) planes."""
    b = samples.shape[0]
    bh, bw = h // 8, w // 8
    x = samples.reshape(b, bh, bw, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def samples_from_coefs(coef: jax.Array, qtab: jax.Array) -> jax.Array:
    """Dequantize + inverse DCT one component's blocks.

    coef: (B, nb, 64) int16 quantized coefficients in natural order (as the
    libjpeg entropy decoder stores them, jdhuff.c); qtab: (B, 64) uint16.
    Returns (B, nb, 64) int32 spatial samples in [0, 255].

    Matches jpeg_idct_islow (jddctint.c): dequant is a plain int32 multiply
    (jdddctmgr.c multiplier table), final samples clamp to [0, 255] — equal
    to libjpeg's range-limit table for any coefficients produced by a real
    encoder (the wraparound region of the table is only reachable with
    corrupt streams, which the serving layer never feeds here).
    """
    deq = coef.astype(jnp.int32) * qtab.astype(jnp.int32)[:, None, :]
    b, nb, _ = deq.shape
    lanes = deq.reshape(b * nb, 8, 8).transpose(1, 2, 0)   # (8, 8, B*nb)
    spatial = idct_islow(lanes) + 128
    spatial = jnp.clip(spatial, 0, 255)
    return spatial.transpose(2, 0, 1).reshape(b, nb, 64)


def bgr_from_ycbcr420(y: jax.Array, c: jax.Array) -> jax.Array:
    """Raw 4:2:0 planes -> (B, h, w, 3) u8 BGR, bit-exact libjpeg path.

    y: (B, h, w) u8/int32; c: (B, 2, h/2, w/2) u8/int32, Cb then Cr.
    """
    cb_up = jax.vmap(h2v2_fancy_upsample)(c[:, 0].astype(jnp.int32))
    cr_up = jax.vmap(h2v2_fancy_upsample)(c[:, 1].astype(jnp.int32))
    return ycbcr_to_bgr_jpeg(y, cb_up, cr_up)


def bgr_from_coefs_420(coef_y: jax.Array, coef_c: jax.Array,
                       qtab: jax.Array, h: int, w: int) -> jax.Array:
    """Quantized 4:2:0 coefficient planes -> (B, h, w, 3) u8 BGR.

    coef_y: (B, (h/8)*(w/8), 64) i16; coef_c: (B, 2, (h/16)*(w/16), 64) i16;
    qtab: (B, 2, 64) u16 (luma, chroma) in natural order. h, w % 16 == 0.
    """
    y = _blocks_to_plane_batch(samples_from_coefs(coef_y, qtab[:, 0]), h, w)
    cb = _blocks_to_plane_batch(
        samples_from_coefs(coef_c[:, 0], qtab[:, 1]), h // 2, w // 2)
    cr = _blocks_to_plane_batch(
        samples_from_coefs(coef_c[:, 1], qtab[:, 1]), h // 2, w // 2)
    cb_up = jax.vmap(h2v2_fancy_upsample)(cb)
    cr_up = jax.vmap(h2v2_fancy_upsample)(cr)
    return ycbcr_to_bgr_jpeg(y, cb_up, cr_up)
