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

# Batched-lookup dataflow for clahe_u8_batch: True = hi/lo-nibble one-hots
# (two rank-16 contractions), False = single rank-256 one-hot. Bit-identical
# outputs either way; a module flag (not config) because it is a pure
# scheduling choice — tools/tick_ab.py A/Bs it inside the fused serving
# tick, where MXU/VPU port balance decides, not isolated stage time.
NIBBLE_LOOKUP = True

# Corner-LUT selection dataflow: True = constant-index take along the tile
# axis, False = one-hot matmul. Bit-identical either way; A/B'd on silicon
# by tools/roofline_probe.py (round 5).
CORNER_TAKE = False


def _lut_for_tile(hist: np.ndarray, clip_limit: int, tile_area: int) -> np.ndarray:
    """Classic CLAHE LUT: clip, redistribute excess as uniform integer batch
    + residual stepped every (256//residual) bins starting at bin 0, then the
    rounded-CDF LUT. Verified bit-exact vs cv2 5.0 for tile-divisible images
    across areas 48..4096 (controlled-histogram probes; see tests).

    Non-divisible geometry: cv2 5.0 pads with its LITERAL rule (see
    _cv2_pad_amounts — a divisible dim gets a FULL extra tile when the
    other dim triggers padding); with that reproduced, non-divisible
    outputs match cv2 exactly up to the residual below.

    RESIDUAL DEVIATION (divisible sizes included): at certain tile sizes
    (empirically 10/18/20/22-px tiles) a <0.5% subset of pixels differs by
    +-1 from cv2 — f32 lerp values landing on rounding boundaries, where
    cv2's own result depends on its build's fma contraction (probes: exact
    two-step f32, fma-coordinate, fma-accumulation, f64, and fixed-point
    reconstructions each match a different subset). Bit-parity there is
    ill-defined against cv2-as-a-family; this implementation keeps numpy's
    two-step f32 arithmetic."""
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


def _cv2_pad_amounts(h: int, w: int, tiles: int):
    """cv2 5.0's LITERAL padding rule (clahe.cpp): when EITHER dimension is
    not tile-divisible, BOTH are padded by `tiles - dim % tiles` — which is
    a FULL EXTRA TILE for a dimension that was already divisible. Empirical
    discovery (this repo, vs cv2 5.0.0): a modulo pad (`(-dim) % tiles`)
    matches cv2 only when both dims are non-divisible; with exactly one
    divisible dim the tile geometry diverges and outputs differ by up to
    tens of grey levels. With this rule the non-divisible geometry matches
    cv2 exactly."""
    if h % tiles or w % tiles:
        return tiles - (h % tiles), tiles - (w % tiles)
    return 0, 0


def clahe_u8_numpy(src: np.ndarray, clip_limit: float = 2.0,
                   tiles: int = 8) -> np.ndarray:
    """cv2.createCLAHE(clip_limit, (tiles,tiles)).apply(src), bit-exact up
    to cv2's own build-dependent f32 lerp ties (see module docstring)."""
    h, w = src.shape
    ph, pw = _cv2_pad_amounts(h, w, tiles)
    tile_h = (h + ph) // tiles
    tile_w = (w + pw) // tiles
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


def clahe_u8_batch(imgs: jax.Array, clip_limit: float = 2.0,
                   tiles: int = 8) -> jax.Array:
    """Batched CLAHE for the serving tick: (B, H, W) u8 -> (B, H, W) u8,
    H and W divisible by 2*tiles (the 160-px align bucket is).

    TPU-first formulation — measured on v5e against the alternatives (the
    vmapped Pallas kernel ran 27 ms/64-batch; per-pixel table gathers 115 ms;
    scatter histograms 18 ms; a single rank-256 one-hot lookup 4.0 ms):
      * pixel values split into hi/lo nibbles; TWO rank-16 one-hot tensors
        replace the rank-256 one (5x less materialized one-hot traffic)
      * histograms: the nibble one-hots outer-product over pixels (an MXU
        matmul per tile quadrant) -> exact integer counts
      * per-quadrant corner-LUT selection and the table lookups: one-hot
        matmul then two rank-16 contractions (EXACT in bf16 — LUT entries
        are 8-bit integers and every contraction has a single nonzero term)
      * bilinear combine: per-quadrant static weight planes (same geometry
        as kernels/clahe.py, which stays as the single-image Pallas variant)

    Accuracy: histograms, clip/redistribution and the CDF LUTs are BIT-EXACT
    vs clahe_u8_numpy (integer arithmetic with the oracle's f64 tie
    behavior); the final f32 bilinear lerp may differ by +-1 LSB on <1% of
    pixels where the compiler contracts the lerp into fma (documented in
    docs/DESIGN.md Known numeric deviations; tests/test_forensics.py-style
    golden asserts the bound).
    """
    B, H, W = imgs.shape
    th, tw = H // tiles, W // tiles
    hh, hw = th // 2, tw // 2
    px = hh * hw
    T2 = tiles * tiles
    area = th * tw
    clip = max(int(clip_limit * area / 256), 1) if clip_limit > 0 else 0

    # quadrantize: (B, T2, 4, px) with quadrant order TL,TR,BL,BR
    q = imgs.reshape(B, tiles, 2, hh, tiles, 2, hw)
    q = q.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, T2, 4, px)

    mmt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if NIBBLE_LOOKUP:
        n16 = jnp.arange(16, dtype=jnp.uint8)
        oh_hi = ((q >> 4)[..., None] == n16).astype(mmt)  # (B,T2,4,px,16)
        oh_lo = ((q & 15)[..., None] == n16).astype(mmt)
        # histogram as an outer product over pixels: hist2[h,l] counts
        # pixels with value h*16+l (0/1 products, sums <= px — exact)
        hist2 = jnp.einsum("btqph,btqpl->btqhl", oh_hi, oh_lo,
                           preferred_element_type=jnp.float32)
        hist = jnp.sum(hist2, axis=2).reshape(B, T2, 256).astype(jnp.int32)
    else:
        bins = jnp.arange(256, dtype=jnp.uint8)
        onehot = (q[..., None] == bins)                  # bool (B,T2,4,px,256)
        hist = jnp.sum(onehot, axis=(2, 3), dtype=jnp.int32)
    if clip > 0:
        clipped = jnp.minimum(hist, clip)
        excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
        redist = excess // 256
        residual = excess - redist * 256                  # (B, T2, 1)
        clipped = clipped + redist
        step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
        idx = jnp.arange(256)
        bump = ((jnp.mod(idx, step) == 0) & (idx // step < residual)
                & (residual > 0))
        hist = clipped + bump.astype(jnp.int32)
    cdf = jnp.cumsum(hist, axis=-1)
    # LUT = rint(cdf * scale) must reproduce the host oracle
    # (clahe_u8_numpy) to the last bit WITHOUT f64 on device. The oracle's
    # f64 product cdf * fl64(255/area) deviates from the true rational
    # cdf*255/area by < 2^-35 — that only changes the rint result at EXACT
    # .5 ties, where fl64(255/area)'s rounding error breaks the tie in one
    # fixed direction. So: exact integer division for the non-tie cases,
    # host-computed tie direction for the .5 cases.
    from fractions import Fraction
    fs = Fraction(255.0 / area)
    ft = Fraction(255, area)
    tie_up = fs > ft          # fl64 scale slightly high -> ties round up
    tie_banker = fs == ft     # exact scale -> true rint half-to-even
    n = cdf * 255
    qd = n // area
    r2 = 2 * (n - qd * area)
    if tie_banker:
        tie = qd + (qd % 2)
    elif tie_up:
        tie = qd + 1
    else:
        tie = qd
    luts = jnp.where(r2 > area, qd + 1, jnp.where(r2 < area, qd, tie))
    luts = jnp.clip(luts, 0, 255).astype(jnp.float32)     # (B, T2, 256)

    # static corner-tile table: tile t, quadrant qd interpolates the 2x2
    # tile block starting at (ty-1+qy, tx-1+qx), clamped (same table as
    # kernels/clahe.clahe_apply_pallas)
    C = np.zeros((T2, 4, 4, T2), np.float32)
    for ty in range(tiles):
        for tx in range(tiles):
            for qd in range(4):
                y0 = ty - 1 + (qd // 2)
                x0 = tx - 1 + (qd % 2)
                for c, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                    cy = min(max(y0 + dy, 0), tiles - 1)
                    cx = min(max(x0 + dx, 0), tiles - 1)
                    C[ty * tiles + tx, qd, c, cy * tiles + cx] = 1.0
    # corner selection: either a constant-index take along the tile axis or
    # a one-hot matmul — identical selection (trivially exact) either way;
    # a scheduling choice A/B-able on silicon via the module flag (the
    # einsum materializes the (B,T2,4,4,256) operand through a layout copy,
    # 790 us/tick in the round-5 roofline trace; the take trades that for
    # gather + loop-fusion time — tools/roofline_probe.py measures both)
    if CORNER_TAKE:
        sidx = np.argmax(C, axis=-1).astype(np.int32)    # (T2, 4, 4)
        lut_sel = jnp.take(luts.astype(mmt),
                           jnp.asarray(sidx.reshape(-1)),
                           axis=1).reshape(B, T2, 4, 4, 256)
    else:
        lut_sel = jnp.einsum("bsv,tqcs->btqcv", luts.astype(mmt),
                             jnp.asarray(C, mmt))         # exact: 8-bit LUTs
    if NIBBLE_LOOKUP:
        lut_hl = lut_sel.reshape(B, T2, 4, 4, 16, 16)
        # lookup via two rank-16 contractions; each has a single nonzero
        # term per output (one-hot), so bf16 with f32 accumulation is exact
        t_lo = jnp.einsum("btqpl,btqchl->btqpch", oh_lo, lut_hl,
                          preferred_element_type=jnp.float32).astype(mmt)
        looked = jnp.einsum("btqph,btqpch->btqcp", oh_hi, t_lo,
                            preferred_element_type=jnp.float32)
    else:
        looked = jnp.einsum("btqpv,btqcv->btqcp", onehot.astype(mmt),
                            lut_sel, preferred_element_type=jnp.float32)

    # Bilinear combine with the HOST oracle's exact arithmetic: per-pixel
    # f32 fractions from the GLOBAL coordinate formula (x*(1/tile)-0.5 in
    # f32 — tile-local recomputation would flip last-bit rounding) and the
    # same nested top/bot lerp order. Bit-exact vs clahe_u8_numpy for
    # tile-divisible sizes.
    ya_p, xa_p = _quadrant_fracs(H, W, tiles)            # (T2, 4, px) each
    ya = jnp.asarray(ya_p)[None]
    xa = jnp.asarray(xa_p)[None]
    tl, tr = looked[:, :, :, 0], looked[:, :, :, 1]
    bl, br = looked[:, :, :, 2], looked[:, :, :, 3]
    one = jnp.float32(1.0)
    top = tl * (one - xa) + tr * xa
    bot = bl * (one - xa) + br * xa
    res = top * (one - ya) + bot * ya                    # (B, T2, 4, px)
    out = jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)

    # dequadrantize
    out = out.reshape(B, tiles, tiles, 2, 2, hh, hw)
    out = out.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, H, W)
    return out


def _quadrant_fracs(H: int, W: int, tiles: int):
    """Per-(tile, quadrant, pixel) interpolation fractions (ya, xa), each
    (tiles², 4, hh*hw) f32, computed with clahe_u8_numpy's GLOBAL-coordinate
    f32 arithmetic so the batched path rounds identically."""
    th, tw = H // tiles, W // tiles
    hh, hw = th // 2, tw // 2

    def fracs(n, t):
        v = np.arange(n, dtype=np.float32)
        f = (v * np.float32(1.0 / t) - np.float32(0.5)).astype(np.float32)
        return (f - np.floor(f)).astype(np.float32)

    ya = fracs(H, th).reshape(tiles, 2, hh)       # (ty, qy, r)
    xa = fracs(W, tw).reshape(tiles, 2, hw)       # (tx, qx, c)
    ya_full = np.broadcast_to(
        ya[:, None, :, None, :, None],
        (tiles, tiles, 2, 2, hh, hw)).astype(np.float32)
    xa_full = np.broadcast_to(
        xa[None, :, None, :, None, :],
        (tiles, tiles, 2, 2, hh, hw)).astype(np.float32)
    T2, px = tiles * tiles, hh * hw
    return (ya_full.reshape(T2, 4, px).copy(),
            xa_full.reshape(T2, 4, px).copy())


def clahe_u8_jnp(src: jax.Array, clip_limit: float = 2.0, tiles: int = 8) -> jax.Array:
    """Fixed-shape jitted CLAHE (same algorithm incl. cv2 5.0's literal
    padding; H, W static, divisible by `tiles` for the batched device
    path)."""
    h, w = src.shape
    ph, pw = _cv2_pad_amounts(h, w, tiles)
    tile_h = (h + ph) // tiles
    tile_w = (w + pw) // tiles
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
