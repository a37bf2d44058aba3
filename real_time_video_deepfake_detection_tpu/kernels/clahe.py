"""Pallas TPU kernels: CLAHE (contrast-limited adaptive hist equalization).

The face-preprocessing chain applies CLAHE to every crop
(deepfake_detection.py:357-370); the north star names it as a fused-kernel
target. Gather/scatter are the enemies on TPU (see ops/forensics.py history),
so both CLAHE passes are formulated without either:

  pass 1 (per input tile): 256-bin histogram as a vectorized
      (256 bins x tile_px) compare-reduce; OpenCV's clip + integer
      batch/residual redistribution; rounded-CDF LUT.
  pass 2 (per output tile): the bilinear LUT interpolation works per
      QUADRANT — within one quadrant all pixels use the same 2x2 LUT set, so
      the four LUT rows are chosen with unrolled scalar selects, and the
      per-pixel lookup lut[img] becomes a one-hot(img) @ luts4 matmul on the
      MXU, combined with the (static) bilinear weights.

Shapes: H, W divisible by 2*tiles (the serving buckets satisfy this; the
host path for arbitrary crops is ops/clahe.clahe_u8_numpy). Bit-equivalent
to ops/clahe.clahe_u8_jnp (cv2-exact for divisible sizes) — tested in
interpret mode and on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILES = 8


# --------------------------------------------------------------- pass 1: LUTs

def _hist_lut_kernel(img_ref, out_ref, *, clip: int, tile_area: int):
    # img block (1, 1, px): pre-flattened on host (Mosaic rejects 2D->1D
    # reshapes in-kernel)
    tile = img_ref[0].astype(jnp.int32)                        # (1, px)
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)
    hist = jnp.sum((tile == bins).astype(jnp.int32), axis=1)   # (256,)

    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped)
    redist = excess // 256
    residual = excess - redist * 256
    clipped = clipped + redist
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)[:, 0]
    bump = ((jnp.mod(idx, step) == 0) & (idx // step < residual)
            & (residual > 0)).astype(jnp.int32)
    hist = clipped + bump

    # prefix sum via lower-triangular matmul (Mosaic has no cumsum): exact
    # in f32 (counts sum to tile_area << 2^24)
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
    tri = (rows >= cols).astype(jnp.float32)
    cdf = jnp.dot(tri, hist.astype(jnp.float32)[:, None],
                  preferred_element_type=jnp.float32)[:, 0]
    scale = 255.0 / tile_area
    lut = jnp.clip(jnp.rint(cdf * scale), 0, 255)
    out_ref[0, 0, :] = lut


def clahe_luts_pallas(img_u8: jax.Array, clip_limit: float = 2.0,
                      interpret: bool = False) -> jax.Array:
    """(H, W) u8 -> (64, 256) f32 per-tile LUTs (tile grid 8x8)."""
    h, w = img_u8.shape
    th, tw = h // _TILES, w // _TILES
    tiled = img_u8.reshape(_TILES, th, _TILES, tw).transpose(0, 2, 1, 3)
    tiled = tiled.reshape(_TILES * _TILES, 1, th * tw)
    area = th * tw
    clip = max(int(clip_limit * area / 256), 1)
    kernel = functools.partial(_hist_lut_kernel, clip=clip, tile_area=area)
    return pl.pallas_call(
        kernel,
        grid=(_TILES * _TILES,),
        in_specs=[pl.BlockSpec((1, 1, th * tw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_TILES * _TILES, 1, 256), jnp.float32),
        interpret=interpret,
    )(tiled)[:, 0, :]


# -------------------------------------------------------------- pass 2: apply

@functools.lru_cache(maxsize=None)
def _quadrant_geometry(th: int, tw: int):
    """Per-quadrant bilinear weights (shared by every tile) and the corner
    tile OFFSETS each quadrant interpolates: quadrant q in {TL,TR,BL,BR}
    uses tile rows {ty-1|ty, ty|ty+1} x cols {tx-1|tx, tx|tx+1} (clamped)."""
    hh, hw = th // 2, tw // 2
    yy = np.arange(th, dtype=np.float64)
    xx = np.arange(tw, dtype=np.float64)
    # OpenCV geometry: tyf = y_global/th - 0.5, ya = tyf - floor(tyf). Within
    # a tile: top half (yy < th/2) pairs rows (ty-1, ty) with ya = yy/th+0.5;
    # bottom half pairs (ty, ty+1) with ya = yy/th-0.5 — same expression via
    # the wraparound below. Weights are identical for every tile.
    fy = yy / th - 0.5
    fx = xx / tw - 0.5
    ay = np.where(fy < 0, fy + 1.0, fy)  # weight toward the HIGHER tile index
    ax = np.where(fx < 0, fx + 1.0, fx)
    # weights arranged (th, tw, 4): [w_y0x0, w_y0x1, w_y1x0, w_y1x1]
    w = np.stack([
        (1 - ay)[:, None] * (1 - ax)[None, :],
        (1 - ay)[:, None] * ax[None, :],
        ay[:, None] * (1 - ax)[None, :],
        ay[:, None] * ax[None, :],
    ], axis=-1).astype(np.float32)
    return w


def _apply_kernel(img_ref, luts_ref, corners_ref, w_ref, out_ref):
    """img block (1, 4, 1, px): quadrant-flattened on host. w block
    (4, 4, px): per-quadrant corner weights. out (1, 4, 1, px)."""
    n_tiles2 = luts_ref.shape[0]
    vals = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)

    for q in range(4):
        sub = img_ref[0, q, :, :].astype(jnp.int32)            # (1, px)
        onehot = (sub == vals).astype(jnp.float32)             # (256, px)

        # four corner LUT rows for this quadrant: scalar tile ids from SMEM,
        # selected via unrolled compare-sum (gathers are unsupported/slow)
        luts4 = []
        for c in range(4):
            tid = corners_ref[0, q, c]
            row = jnp.zeros((1, 256), jnp.float32)
            for t in range(n_tiles2):
                row = row + jnp.where(tid == t, luts_ref[t, :, :], 0.0)
            luts4.append(row)
        lut_mat = jnp.concatenate(luts4, axis=0)               # (4, 256)

        looked = jnp.dot(lut_mat, onehot,
                         preferred_element_type=jnp.float32)   # (4, px)
        res = jnp.sum(looked * w_ref[q], axis=0, keepdims=True)  # (1, px)
        # (f32->u8 cast is unsupported in Mosaic; go through int32)
        out_ref[0, q, :, :] = jnp.clip(
            jnp.rint(res), 0, 255).astype(jnp.int32).astype(jnp.uint8)


def _quadrantize(img_u8: jax.Array, th: int, tw: int) -> jax.Array:
    """(H, W) -> (tiles², 4, 1, hh*hw): tiles split into TL/TR/BL/BR
    quadrant-flattened rows (host-side layout prep for the apply kernel)."""
    hh, hw = th // 2, tw // 2
    t = img_u8.reshape(_TILES, 2, hh, _TILES, 2, hw)
    # axes: (ty, qy, yy, tx, qx, xx) -> (ty, tx, qy, qx, yy, xx)
    t = t.transpose(0, 3, 1, 4, 2, 5)
    return t.reshape(_TILES * _TILES, 4, 1, hh * hw)


def _dequadrantize(out: jax.Array, h: int, w: int) -> jax.Array:
    th, tw = h // _TILES, w // _TILES
    hh, hw = th // 2, tw // 2
    t = out.reshape(_TILES, _TILES, 2, 2, hh, hw)
    t = t.transpose(0, 2, 4, 1, 3, 5)
    return t.reshape(h, w)


def clahe_apply_pallas(img_u8: jax.Array, luts: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """(H, W) u8 + (64, 256) LUTs -> CLAHE output (H, W) u8."""
    h, w = img_u8.shape
    th, tw = h // _TILES, w // _TILES
    quads = _quadrantize(img_u8, th, tw)

    # corner tile ids per (tile, quadrant, corner), clamped at borders
    corners = np.zeros((_TILES * _TILES, 4, 4), np.int32)
    for ty in range(_TILES):
        for tx in range(_TILES):
            for q in range(4):
                y0 = ty - 1 + (q // 2)
                x0 = tx - 1 + (q % 2)
                ids = []
                for dy in (0, 1):
                    for dx in (0, 1):
                        cy = min(max(y0 + dy, 0), _TILES - 1)
                        cx = min(max(x0 + dx, 0), _TILES - 1)
                        ids.append(cy * _TILES + cx)
                corners[ty * _TILES + tx, q] = ids
    # weights (th, tw, 4) -> per-quadrant (4 quadrants, 4 corners, hh*hw)
    hh, hw = th // 2, tw // 2
    wg = _quadrant_geometry(th, tw)                       # (th, tw, 4)
    wq = wg.reshape(2, hh, 2, hw, 4).transpose(0, 2, 4, 1, 3)
    wq = wq.reshape(4, 4, hh * hw)
    wgeom = jnp.asarray(wq)

    px = hh * hw
    out = pl.pallas_call(
        _apply_kernel,
        grid=(_TILES * _TILES,),
        in_specs=[
            pl.BlockSpec((1, 4, 1, px), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILES * _TILES, 1, 256), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 4, px), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 1, px), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_TILES * _TILES, 4, 1, px), jnp.uint8),
        interpret=interpret,
    )(quads, luts[:, None, :], jnp.asarray(corners), wgeom)
    return _dequadrantize(out, h, w)


def clahe_u8_pallas(img_u8: jax.Array, clip_limit: float = 2.0,
                    interpret: bool = False) -> jax.Array:
    """Full CLAHE via the two Pallas passes (H, W divisible by 16)."""
    luts = clahe_luts_pallas(img_u8, clip_limit, interpret)
    return clahe_apply_pallas(img_u8, luts, interpret)
