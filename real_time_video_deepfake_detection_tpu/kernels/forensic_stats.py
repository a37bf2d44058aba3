"""Pallas TPU kernel: fused noise-residual block statistics.

The noise-consistency signal (reference frame_analysis.py:182-225, the
"HOT LOOP #1" python block loops) is: gray = BGR2GRAY(frame);
residual = gray - GaussianBlur5(gray); then per-32x32-block std. As separate
XLA ops that chain writes three full (256,256) f32 intermediates to HBM per
frame. This kernel computes the whole chain for one frame per grid step
entirely in VMEM (frame block 196 KB + two f32 scratch planes ≈ 0.7 MB):

  u8 BGR -> fixed-point gray (bit-exact, 2^15 coefficients)
  -> separable [1,4,6,4,1]/16 blur with reflect-101 edges
  -> residual -> per-block sum/sumsq -> (8,8) mean and population std

Numerics match ops/forensics._block_stats(noise) to 1e-4 (tests).

STATUS: validated in interpret mode; the Mosaic TC lowering currently
over-allocates ~96 MB of kernel stack for this program (scoped-vmem OOM)
regardless of banding/matmul reformulations — the XLA path in
ops/forensics.noise_score remains the production route (it is not a
bottleneck; see docs/DESIGN.md). kernels/{clahe,preproc,color_stats}.py DO
compile and run bit-exact on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 32


def _reflect101_pad2(x):
    """(H, W) -> (H+4, W+4) reflect-101 padding from forward slices (Mosaic
    has no `rev` lowering, so each mirrored row/col is sliced individually)."""
    top = jnp.concatenate([x[2:3, :], x[1:2, :]], axis=0)
    bot = jnp.concatenate([x[-2:-1, :], x[-3:-2, :]], axis=0)
    y = jnp.concatenate([top, x, bot], axis=0)
    left = jnp.concatenate([y[:, 2:3], y[:, 1:2]], axis=1)
    right = jnp.concatenate([y[:, -2:-1], y[:, -3:-2]], axis=1)
    return jnp.concatenate([left, y, right], axis=1)


def _kernel(frame_ref, mean_ref, std_ref):
    f = frame_ref[0].astype(jnp.int32)          # (H, W, 3) u8 -> i32
    b, g, r = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    gray = ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15).astype(jnp.float32)

    h, w = gray.shape
    p = _reflect101_pad2(gray)                  # (h+4, w+4)
    k = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
    n = float(_BLK * _BLK)

    # Process one 32-row block-band at a time: keeping the whole blurred
    # plane live at once blows the 16 MB VMEM scoped limit (measured 95 MB
    # of stack temporaries); per-band temporaries are ~150 KB.
    nb_h, nb_w = h // _BLK, w // _BLK
    for band in range(nb_h):
        r0 = band * _BLK
        pband = p[r0:r0 + _BLK + 4, :]           # (36, w+4) incl. halo
        acc = jnp.zeros((_BLK + 4, w), jnp.float32)
        for i in range(5):
            acc = acc + pband[:, i:i + w] * k[i]
        blur = jnp.zeros((_BLK, w), jnp.float32)
        for j in range(5):
            blur = blur + acc[j:j + _BLK, :] * k[j]
        noise = gray[r0:r0 + _BLK, :] - blur     # (32, w)
        # per-block column sums via a segment matmul (lane-splitting reshapes
        # are unsupported in Mosaic): S[j, c] = 1 iff j // 32 == c
        cols = jax.lax.broadcasted_iota(jnp.int32, (w, nb_w), 0) // _BLK
        segs = jax.lax.broadcasted_iota(jnp.int32, (w, nb_w), 1)
        S = (cols == segs).astype(jnp.float32)   # (w, nb_w)
        ones_row = jnp.ones((8, _BLK), jnp.float32)   # 8 sublanes for layout
        colsum = jnp.dot(ones_row, noise, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)[:1]   # (1, w)
        colsum2 = jnp.dot(ones_row, noise * noise,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)[:1]
        # stay 2D throughout (1D values hit Mosaic's "implicit dimension")
        s1 = jnp.dot(colsum, S, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)       # (1, nb_w)
        s2 = jnp.dot(colsum2, S, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        mean_ref[0, band:band + 1, :] = mean
        std_ref[0, band:band + 1, :] = jnp.sqrt(var)


def noise_block_stats_pallas(frames_u8: jax.Array, interpret: bool = False):
    """(B, 256, 256, 3) u8 BGR -> ((B, 8, 8) block means, (B, 8, 8) stds)
    of the gaussian-highpass noise residual, one fused VMEM pass per frame."""
    b, h, w, _ = frames_u8.shape
    nb_h, nb_w = h // _BLK, w // _BLK
    mean, std = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w, 3), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, nb_h, nb_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_h, nb_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nb_h, nb_w), jnp.float32),
            jax.ShapeDtypeStruct((b, nb_h, nb_w), jnp.float32),
        ),
        interpret=interpret,
    )(frames_u8)
    return mean, std
