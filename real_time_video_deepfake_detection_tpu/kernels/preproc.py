"""Pallas TPU kernel: fused face preprocessing (resize + scale + normalize).

The serving hot path runs `preprocess_aligned` per face: bilinear resize
160->224, /255, ImageNet normalize (pipeline/classify.py). This kernel fuses
all of it into one VMEM-resident program per image:

  - bilinear resize expressed as two banded interpolation matmuls
    (OUT_c = Ry @ IMG_c @ Rx^T) so the resampling itself runs on the MXU
    with fp32 accumulation — identical math to the gather formulation
    (the interpolation matrices ARE the gather weights)
  - scale + per-channel mean/std normalization fused into the epilogue
  - one grid step per (image, channel): everything stays in VMEM
    (160*160*4 + 224*160*4 + 2*224*160*4 ≈ 0.6 MB per step)

Equivalence vs the jnp reference path is tested to 1e-4 in
tests/test_pallas_kernels.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.resize import _linear_tables_f32

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@functools.lru_cache(maxsize=None)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) banded bilinear interpolation matrix (half-pixel centers,
    edge clamped) — row i holds the two gather weights of output i."""
    sx, sx1, w0, w1 = _linear_tables_f32(src, dst)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), sx] += w0
    m[np.arange(dst), sx1] += w1
    return m


def _kernel(img_ref, ry_ref, rxt_ref, mean_ref, std_ref, out_ref):
    """Grid: (batch, channel). img block (1,1,H,W) f32 raw 0-255.
    HIGHEST precision: the v5e MXU is bf16-native; single-pass bf16 would
    drift the resample by ~1% (measured)."""
    img = img_ref[0, 0, :, :]
    tmp = jnp.dot(ry_ref[:], img, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    res = jnp.dot(tmp, rxt_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    mean = mean_ref[0, 0, 0]
    std = std_ref[0, 0, 0]
    out_ref[0, 0, :, :] = (res * (1.0 / 255.0) - mean) / std


def preprocess_faces_pallas(faces_raw: jax.Array, out_size: int = 224,
                            interpret: bool = False) -> jax.Array:
    """(B, H, W, 3) float raw-RGB aligned faces -> (B, out, out, 3)
    normalized fp32, fused in one Pallas program."""
    b, h, w, _ = faces_raw.shape
    ry = jnp.asarray(_interp_matrix(h, out_size))          # (out, h)
    rxt = jnp.asarray(_interp_matrix(w, out_size).T)       # (w, out)
    mean = jnp.asarray(_IMAGENET_MEAN).reshape(3, 1, 1)
    std = jnp.asarray(_IMAGENET_STD).reshape(3, 1, 1)

    # operate channel-major: (B, 3, H, W)
    x = jnp.transpose(faces_raw.astype(jnp.float32), (0, 3, 1, 2))

    grid = (b, 3)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, h), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_size), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, out_size, out_size),
                               lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, out_size, out_size), jnp.float32),
        interpret=interpret,
    )(x, ry, rxt, mean, std)
    return jnp.transpose(out, (0, 2, 3, 1))
