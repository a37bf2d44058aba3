"""Temporal-attention head training (BASELINE config 5).

The clip head (models/temporal_head.py) replaces the reference's 10-frame
majority vote (deepfake_detection.py:146-196) with a learned verdict over a
window of per-frame backbone features. This module trains it on clips of
features: extract features once with the frozen backbone (the expensive
part, batched on the MXU), then fit the small head with focal loss — the
same objective the reference trainer uses for the frame classifier
(train.py:360-392).

Typical use:
    feats = extract_clip_features(params_b0, spec, clips_u8)   # (N,T,1280)
    head, log = train_clip_head(key, feats, labels, hspec)
    save via train/checkpoint.save_checkpoint -> serve with
    `--batched --clip-window T --clip-head head.npz`.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import temporal_head as th
from ..models.efficientnet import EfficientNetSpec, extract_features
from ..pipeline.classify import preprocess_aligned
from .losses import focal_loss_with_smoothing


def extract_clip_features(backbone_params, spec: EfficientNetSpec,
                          clips_rgb_raw: jax.Array,
                          batch_frames: int = 256) -> jax.Array:
    """(N, T, H, W, 3) raw-RGB face crops -> (N, T, feat) pooled backbone
    features, frozen backbone, chunked so any N*T fits device memory."""
    n, t = clips_rgb_raw.shape[:2]
    flat = clips_rgb_raw.reshape((n * t,) + clips_rgb_raw.shape[2:])

    @jax.jit
    def run(chunk):
        x = jax.vmap(lambda f: preprocess_aligned(f.astype(jnp.float32)))(chunk)
        return extract_features(backbone_params, x, spec, train=False)

    outs = []
    for i in range(0, n * t, batch_frames):
        outs.append(run(flat[i:i + batch_frames]))
    feats = jnp.concatenate(outs, axis=0)
    return feats.reshape(n, t, feats.shape[-1])


@partial(jax.jit, static_argnums=(4, 5))
def _step(params, opt_state, feats, labels, hspec: th.TemporalHeadSpec, tx):
    mask = jnp.ones(feats.shape[:2], bool)

    def loss_fn(p):
        logits = th.forward(p, feats, mask, hspec)
        return focal_loss_with_smoothing(logits, labels), logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    acc = jnp.mean(((jax.nn.sigmoid(logits) > 0.5) == (labels > 0.5)))
    return params, opt_state, loss, acc


def train_clip_head(key: jax.Array, feats: jax.Array, labels: jax.Array,
                    hspec: th.TemporalHeadSpec, epochs: int = 30,
                    batch_size: int = 32, lr: float = 1e-3,
                    ) -> Tuple[Dict, list]:
    """feats: (N, T, D) float32; labels: (N,) {0,1}. Returns (params, log).

    batch_size is clamped to N so small feature sets still take optimizer
    steps instead of silently returning random-init params (the empty-range
    epoch would also log NaN means)."""
    n = feats.shape[0]
    if n == 0:
        raise ValueError("train_clip_head: empty feature set")
    batch_size = min(batch_size, n)
    params = th.init_params(key, hspec)
    tx = optax.adamw(lr, weight_decay=1e-4)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    log = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            params, opt_state, loss, acc = _step(
                params, opt_state, feats[idx], labels[idx], hspec, tx)
            losses.append(float(loss))
            accs.append(float(acc))
        log.append({"epoch": epoch, "loss": float(np.mean(losses)),
                    "acc": float(np.mean(accs))})
    return params, log
