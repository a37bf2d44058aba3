"""Frequency-domain feature maps (reference model.py:105-149).

FFT magnitude (fftshift + log1p, min-max normalized) stacked with DCT-II
coefficients (log1p(|dct(gray/255)|), normalized) as a (2, size, size)
float32 tensor. The reference computes this for every face inference and
then discards it (model.forward ignores freq_input — model.py:63-72); it is
provided here both for checkpoint/API compatibility and as a usable input
for future frequency-aware heads.

DCT-II is computed in the matmul form (D @ X @ D^T with the orthonormal
DCT basis) — exactly cv2.dct semantics, and MXU-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .color import bgr_to_gray_u8
from .resize import resize_bilinear_u8_cv2


@functools.lru_cache(maxsize=None)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (cv2.dct convention)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m.astype(np.float32)


def dct2(x: jax.Array) -> jax.Array:
    """2-D DCT-II of an (N, M) float array == cv2.dct(x)."""
    dn = jnp.asarray(_dct_basis(x.shape[0]))
    dm = jnp.asarray(_dct_basis(x.shape[1]))
    return dn @ x @ dm.T


def idct2(x: jax.Array) -> jax.Array:
    dn = jnp.asarray(_dct_basis(x.shape[0]))
    dm = jnp.asarray(_dct_basis(x.shape[1]))
    return dn.T @ x @ dm


def _minmax_norm(x: jax.Array) -> jax.Array:
    lo = jnp.min(x)
    hi = jnp.max(x)
    return jnp.where(hi - lo > 1e-6, (x - lo) / (hi - lo), jnp.zeros_like(x))


def compute_frequency_features(image: jax.Array, size: int = 224) -> jax.Array:
    """uint8 (H, W, 3) or (H, W) image -> (2, size, size) float32
    [FFT-magnitude channel, DCT channel] (reference model.py:105-149)."""
    if image.ndim == 3:
        gray = bgr_to_gray_u8(image)
    else:
        gray = image
    gray = resize_bilinear_u8_cv2(gray, size, size).astype(jnp.float32)

    mag = jnp.log1p(jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(gray))))
    mag = _minmax_norm(mag)

    d = jnp.log1p(jnp.abs(dct2(gray / 255.0)))
    d = _minmax_norm(d)

    return jnp.stack([mag, d], axis=0).astype(jnp.float32)
