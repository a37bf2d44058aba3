"""Pallas TPU kernel: fused color-signal statistics.

The color forensic signal needs (frame_analysis.py:311-347): HSV saturation
std, value std, and the number of distinct hues. On TPU every standard
formulation of the unique-hue count is pathological at batch 64 (measured,
fused-program): scatter-add histogram 118 ms, jnp.sort 73 ms, a 181-step
lax.fori_loop of any-equal reduces ~70 ms (per-iteration loop overhead),
and the dense one-hot compare hangs the compiler.

This kernel does the whole signal in one VMEM pass per frame: bit-exact
integer BGR->HSV (OpenCV's 12-bit division tables, passed in as inputs),
sat/val moment accumulation, and the 181-bin presence loop as in-kernel
vector compares (~64 VPU ops per bin, no per-step dispatch). Outputs
(sat_std, val_std, unique_hues) per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import _SDIV_TABLE, _HDIV_TABLE, _HSV_SHIFT


def _kernel(frame_ref, sdiv_ref, hdiv_ref, out_ref):
    f = frame_ref[0].astype(jnp.int32)            # (H, W, 3)
    b, g, r = f[:, :, 0], f[:, :, 1], f[:, :, 2]

    v = jnp.maximum(jnp.maximum(b, g), r)
    vmin = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - vmin

    s = (diff * sdiv_ref[v] + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    vr = v == r
    vg = v == g
    h_raw = jnp.where(vr, g - b, jnp.where(vg, b - r + 2 * diff, r - g + 4 * diff))
    h = (h_raw * hdiv_ref[diff] + (1 << (_HSV_SHIFT - 1))) >> _HSV_SHIFT
    h = jnp.where(h < 0, h + 180, h)

    n = float(s.size)
    sf = s.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # two-pass variance: the single-pass sumsq form loses ~3 digits in f32
    # at 65536 samples of magnitude 255
    sat_mean = jnp.sum(sf) / n
    val_mean = jnp.sum(vf) / n
    sat_var = jnp.sum((sf - sat_mean) ** 2) / n
    val_var = jnp.sum((vf - val_mean) ** 2) / n

    def count_bin(bin_idx, acc):
        return acc + jnp.any(h == bin_idx).astype(jnp.int32)

    unique = jax.lax.fori_loop(0, 181, count_bin, jnp.int32(0))

    out_ref[0, 0] = jnp.sqrt(jnp.maximum(sat_var, 0.0))
    out_ref[0, 1] = jnp.sqrt(jnp.maximum(val_var, 0.0))
    out_ref[0, 2] = unique.astype(jnp.float32)


def color_stats_pallas(frames_u8: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W, 3) u8 BGR -> (B, 3) [sat_std, val_std, unique_hues]."""
    bsz, h, w, _ = frames_u8.shape
    sdiv = jnp.asarray(_SDIV_TABLE)
    hdiv = jnp.asarray(_HDIV_TABLE)
    return pl.pallas_call(
        _kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((256,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 3), jnp.float32),
        interpret=interpret,
    )(frames_u8, sdiv, hdiv)


def color_score_from_stats(stats: jax.Array) -> jax.Array:
    """(B, 3) kernel outputs -> (B,) color scores (frame_analysis.py:326-347
    step thresholds)."""
    sat_std, val_std, unique = stats[:, 0], stats[:, 1], stats[:, 2]
    score = jnp.where(sat_std < 15, 0.3, jnp.where(sat_std < 25, 0.1, 0.0))
    score += jnp.where(val_std < 15, 0.25, jnp.where(val_std < 25, 0.1, 0.0))
    score += jnp.where(unique < 30, 0.25, jnp.where(unique < 50, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)
