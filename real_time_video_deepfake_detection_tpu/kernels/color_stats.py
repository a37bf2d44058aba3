"""Pallas TPU kernel: unique-hue presence count for the color signal.

The color forensic signal needs (frame_analysis.py:311-347) HSV saturation
std, value std, and the number of distinct hues. The std moments are cheap
XLA reductions; the unique-hue count is the pathological part at batch 64
(measured, fused-program): scatter-add histogram 118 ms (TPU scatters
serialize), jnp.sort 73 ms, a 181-step lax.fori_loop of any-equal reduces
~70 ms (per-step loop overhead), and the dense one-hot compare hangs the
compiler. In-kernel the same 181-bin presence loop is ~64 VPU compares per
bin with no per-step dispatch — microseconds per frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.color import bgr_to_hsv_u8


def _kernel(hue_ref, out_ref):
    h = hue_ref[0].astype(jnp.int32)   # (H, W)

    def count_bin(b, acc):
        return acc + jnp.any(h == b).astype(jnp.float32)

    unique = jax.lax.fori_loop(0, 181, count_bin, jnp.float32(0.0))
    # scatter isn't lowerable in Mosaic; write the scalar via an iota select
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0, :, :] = jnp.where(lane == 0, unique, 0.0)


def unique_hue_count_pallas(hue_u8: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W) u8 hue planes -> (B,) distinct-hue counts (float32)."""
    bsz, h, w = hue_u8.shape
    out = pl.pallas_call(
        _kernel,
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, 128), jnp.float32),
        interpret=interpret,
    )(hue_u8)
    return out[:, 0, 0]


def color_scores_batch(frames_u8: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W, 3) u8 BGR -> (B,) color scores: bit-exact HSV + std moments
    in XLA, unique-hue count in the Pallas kernel
    (frame_analysis.py:311-347 thresholds)."""
    hsv = jax.vmap(bgr_to_hsv_u8)(frames_u8)
    sat = hsv[..., 1].astype(jnp.float32)
    val = hsv[..., 2].astype(jnp.float32)
    sat_mean = jnp.mean(sat, axis=(1, 2), keepdims=True)
    val_mean = jnp.mean(val, axis=(1, 2), keepdims=True)
    sat_std = jnp.sqrt(jnp.mean((sat - sat_mean) ** 2, axis=(1, 2)))
    val_std = jnp.sqrt(jnp.mean((val - val_mean) ** 2, axis=(1, 2)))
    unique = unique_hue_count_pallas(hsv[..., 0], interpret=interpret)

    score = jnp.where(sat_std < 15, 0.3, jnp.where(sat_std < 25, 0.1, 0.0))
    score += jnp.where(val_std < 15, 0.25, jnp.where(val_std < 25, 0.1, 0.0))
    score += jnp.where(unique < 30, 0.25, jnp.where(unique < 50, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)
