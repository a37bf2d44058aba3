"""Per-stream forensic analyzer state as a fixed-shape pytree.

Replaces the reference's mutable analyzer fields (frame_analysis.py:34-37:
`prev_frame_gray`, `temporal_diffs` deque(30), `frame_count`) so the temporal
signal batches across streams and runs inside one jitted step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.config import ForensicConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForensicState:
    prev_gray: jax.Array    # f32[H, W] previous resized grayscale frame
    has_prev: jax.Array     # bool[]
    diffs: jax.Array        # f32[temporal_window] ring of mean |frame diffs|
    n_diffs: jax.Array      # i32[]
    diff_pos: jax.Array     # i32[]
    frame_count: jax.Array  # i32[] analyzer frame counter (frame_analysis.py:68)


def forensic_state_init(cfg: ForensicConfig = ForensicConfig()) -> ForensicState:
    h, w = cfg.analysis_size
    return ForensicState(
        prev_gray=jnp.zeros((h, w), jnp.float32),
        has_prev=jnp.zeros((), bool),
        diffs=jnp.zeros((cfg.temporal_window,), jnp.float32),
        n_diffs=jnp.zeros((), jnp.int32),
        diff_pos=jnp.zeros((), jnp.int32),
        frame_count=jnp.zeros((), jnp.int32),
    )


def forensic_state_reset(state: ForensicState) -> ForensicState:
    return jax.tree.map(jnp.zeros_like, state)


def forensic_state_init_batch(n_streams: int, cfg: ForensicConfig = ForensicConfig()) -> ForensicState:
    one = forensic_state_init(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), one)
