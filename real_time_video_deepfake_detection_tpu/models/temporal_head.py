"""Clip-level temporal attention head (BASELINE config 5).

Replaces the 10-frame majority vote with a learned verdict over a clip of
per-frame backbone features: a small pre-LN transformer over the time axis
with masked attention pooling -> one fake logit for the clip.

Sequence-scaling note (SURVEY.md §5 "long-context"): at <= minutes of 30 fps
features (T ~ 10^3-10^4, D ~ 10^2-10^3) full attention over the window fits
comfortably in VMEM/HBM; ring attention / Ulysses-style sequence parallelism
is unnecessary at these lengths. For very long clips `forward_blockwise`
scans fixed windows with a carried summary token instead.

Streaming: per-stream fixed-size feature ring buffers (same discipline as
the tracker) + this head evaluated per tick; see ClipState.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TemporalHeadSpec:
    feature_dim: int = 1280       # B0 features; 384/768 for ViT
    dim: int = 256
    depth: int = 2
    heads: int = 4
    window: int = 64              # clip length (~2 s at 30 fps)


def init_params(key: jax.Array, spec: TemporalHeadSpec) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4 + 5 * spec.depth))
    d, h = spec.dim, spec.heads

    def dense(k, cin, cout):
        return {"w": jax.random.normal(k, (cin, cout)) * math.sqrt(1.0 / cin),
                "b": jnp.zeros((cout,))}

    p = {
        "inproj": dense(next(keys), spec.feature_dim, d),
        "pos": jax.random.normal(next(keys), (spec.window, d)) * 0.02,
        "blocks": [],
        "pool_q": jax.random.normal(next(keys), (d,)) * 0.02,
        "head": dense(next(keys), d, 1),
    }
    for _ in range(spec.depth):
        p["blocks"].append({
            "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": dense(next(keys), d, 3 * d),
            "proj": dense(next(keys), d, d),
            "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp1": dense(next(keys), d, 4 * d),
            "mlp2": dense(next(keys), 4 * d, d),
        })
    return p


def _ln(x, p, eps=1e-6):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _mha(x, blk, heads, mask):
    b, t, d = x.shape
    hd = d // heads
    qkv = (x @ blk["qkv"]["w"] + blk["qkv"]["b"]).reshape(b, t, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bthc,bshc->bhts", q, k) / math.sqrt(hd)
    attn = jnp.where(mask[:, None, None, :], attn, -1e9)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhts,bshc->bthc", attn, v).reshape(b, t, d)
    return out @ blk["proj"]["w"] + blk["proj"]["b"]


def forward(params, feats: jax.Array, mask: jax.Array,
            spec: TemporalHeadSpec) -> jax.Array:
    """feats (B, T, feature_dim), mask (B, T) valid-frame mask
    -> (B,) clip fake logits. Invalid (padded) frames are masked out of both
    attention and pooling, so streaming ring buffers with partial fill give
    identical results to dense clips."""
    x = feats @ params["inproj"]["w"] + params["inproj"]["b"]
    x = x + params["pos"][None, :x.shape[1]]
    for blk in params["blocks"]:
        x = x + _mha(_ln(x, blk["ln1"]), blk, spec.heads, mask)
        y = _ln(x, blk["ln2"])
        y = jax.nn.gelu(y @ blk["mlp1"]["w"] + blk["mlp1"]["b"])
        x = x + (y @ blk["mlp2"]["w"] + blk["mlp2"]["b"])

    # masked attention pooling with a learned query
    score = x @ params["pool_q"] / math.sqrt(spec.dim)
    score = jnp.where(mask, score, -1e9)
    w = jax.nn.softmax(score, axis=-1)
    pooled = jnp.einsum("bt,btd->bd", w, x)
    logit = pooled @ params["head"]["w"] + params["head"]["b"]
    return logit[:, 0]


def forward_blockwise(params, feats: jax.Array, mask: jax.Array,
                      spec: TemporalHeadSpec, block: int = 256) -> jax.Array:
    """Very-long-clip variant: lax.scan over fixed windows, carrying a mean
    summary of previous window features prepended as a context frame.
    Window size is capped at spec.window - 1 (the learned positional table
    bounds the per-window sequence length)."""
    block = min(block, spec.window - 1)
    b, t, fd = feats.shape
    pad = (-t) % block
    feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n = feats.shape[1] // block
    fb = feats.reshape(b, n, block, fd).transpose(1, 0, 2, 3)
    mb = mask.reshape(b, n, block).transpose(1, 0, 2)

    def step(carry, inp):
        ctx, ctx_valid = carry
        f, m = inp
        f2 = jnp.concatenate([ctx[:, None], f], axis=1)
        m2 = jnp.concatenate([ctx_valid[:, None], m], axis=1)
        logit = forward(params, f2, m2, dataclasses.replace(spec, window=block + 1))
        denom = jnp.maximum(jnp.sum(m, 1, keepdims=True), 1)
        new_ctx = jnp.sum(jnp.where(m[..., None], f, 0.0), axis=1) / denom
        any_valid = jnp.any(m, axis=1)
        new_ctx = jnp.where(any_valid[:, None], new_ctx, ctx)
        return (new_ctx, ctx_valid | any_valid), logit

    init = (jnp.zeros((b, fd)), jnp.zeros((b,), bool))
    (_, _), logits = jax.lax.scan(step, init, (fb, mb))
    return logits[-1]


# ----------------------------------------------------- streaming clip state

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClipState:
    feats: jax.Array    # (window, feature_dim) ring
    n: jax.Array        # i32[]
    pos: jax.Array      # i32[]


def clip_state_init(spec: TemporalHeadSpec) -> ClipState:
    return ClipState(
        feats=jnp.zeros((spec.window, spec.feature_dim), jnp.float32),
        n=jnp.zeros((), jnp.int32),
        pos=jnp.zeros((), jnp.int32))


def clip_state_push(state: ClipState, feat: jax.Array,
                    valid: jax.Array = True) -> ClipState:
    valid = jnp.asarray(valid, bool)
    cap = state.feats.shape[0]
    feats = jnp.where(valid, state.feats.at[state.pos].set(feat), state.feats)
    n = jnp.where(valid, jnp.minimum(state.n + 1, cap), state.n)
    pos = jnp.where(valid, jnp.mod(state.pos + 1, cap), state.pos)
    return ClipState(feats, n, pos)


def clip_verdict(params, state: ClipState, spec: TemporalHeadSpec) -> jax.Array:
    """Fake probability for the stream's current window."""
    cap = state.feats.shape[0]
    i = jnp.arange(cap)
    idx = jnp.mod(state.pos - state.n + i, cap)
    ordered = state.feats[idx]
    mask = i < state.n
    logit = forward(params, ordered[None], mask[None], spec)
    return jax.nn.sigmoid(logit)[0]
