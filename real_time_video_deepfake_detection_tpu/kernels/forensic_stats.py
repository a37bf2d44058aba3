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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 32


def _reflect101_pad2(x):
    """(H, W) -> (H+4, W+4) reflect-101 padding built from slices (jnp.pad
    with reflect lowers fine in Mosaic, but explicit slices keep it cheap)."""
    top = x[2:0:-1, :]
    bot = x[-2:-4:-1, :]
    y = jnp.concatenate([top, x, bot], axis=0)
    left = y[:, 2:0:-1]
    right = y[:, -2:-4:-1]
    return jnp.concatenate([left, y, right], axis=1)


def _kernel(frame_ref, mean_ref, std_ref):
    f = frame_ref[0].astype(jnp.int32)          # (H, W, 3) u8 -> i32
    b, g, r = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    gray = ((r * 9798 + g * 19235 + b * 3735 + (1 << 14)) >> 15).astype(jnp.float32)

    h, w = gray.shape
    p = _reflect101_pad2(gray)
    k = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
    acc = jnp.zeros((h + 4, w), jnp.float32)
    for i in range(5):
        acc = acc + p[:, i:i + w] * k[i]
    blur = jnp.zeros((h, w), jnp.float32)
    for j in range(5):
        blur = blur + acc[j:j + h, :] * k[j]

    noise = gray - blur
    nb = h // _BLK
    blocks = noise.reshape(nb, _BLK, w // _BLK, _BLK)
    s1 = jnp.sum(blocks, axis=(1, 3))
    s2 = jnp.sum(blocks * blocks, axis=(1, 3))
    n = float(_BLK * _BLK)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    mean_ref[0] = mean
    std_ref[0] = jnp.sqrt(var)


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
