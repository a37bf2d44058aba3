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
    """hue block (1, n_chunks, chunk) int32. Bins fully vectorized: each of
    the few chunk iterations compares a (256 bins, chunk px) tile on the VPU
    — a 181-step scalar bin loop costs ~1 ms/frame in loop overhead; this
    form is ~tens of µs."""
    n_chunks = hue_ref.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0)

    # static unroll (n_chunks is small): dynamic indexing into the chunk dim
    # isn't provably aligned for Mosaic's vector loads
    presence = jnp.zeros((256, 1), jnp.bool_)
    for i in range(n_chunks):
        chunk = hue_ref[0, i, :].astype(jnp.int32).reshape(1, -1)
        eq = chunk == bins                        # (256, chunk)
        presence = presence | jnp.any(eq, axis=1, keepdims=True)
    valid = jax.lax.broadcasted_iota(jnp.int32, (256, 1), 0) < 181
    unique = jnp.sum((presence & valid).astype(jnp.float32))
    # scatter isn't lowerable in Mosaic; write the scalar via an iota select
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[0, :, :] = jnp.where(lane == 0, unique, 0.0)


def unique_hue_count_pallas(hue_u8: jax.Array, interpret: bool = False,
                            chunk: int = 8192) -> jax.Array:
    """(B, H, W) u8 hue planes -> (B,) distinct-hue counts (float32)."""
    bsz, h, w = hue_u8.shape
    total = h * w
    n_chunks = max(total // chunk, 1)
    chunk = total // n_chunks
    hue = hue_u8.reshape(bsz, n_chunks, chunk)
    out = pl.pallas_call(
        _kernel,
        grid=(bsz,),
        in_specs=[pl.BlockSpec((1, n_chunks, chunk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, 128), jnp.float32),
        interpret=interpret,
    )(hue)
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
