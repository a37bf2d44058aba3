"""Training losses (reference train.py:360-392: FocalLoss with label
smoothing on binary logits)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss_with_smoothing(logits: jax.Array, labels: jax.Array,
                              gamma: float = 2.0, alpha: float = 0.25,
                              label_smoothing: float = 0.1) -> jax.Array:
    """Binary focal loss, mean-reduced.

    Matches the reference semantics (train.py:380-392) EXACTLY: targets are
    smoothed to y*(1-ls)+0.5*ls first, and the SMOOTHED targets feed all
    three terms — the BCE, p_t, and alpha_t (the reference reassigns
    `targets` before computing any of them). With ls=0.1 that makes p_t
    continuous rather than a hard class-select; trajectory-verified against
    the torch FocalLoss in tests/test_torch_trajectory.py.
    """
    labels = labels.astype(jnp.float32)
    y = labels * (1.0 - label_smoothing) + 0.5 * label_smoothing
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    bce = -(y * log_p + (1.0 - y) * log_not_p)
    p = jax.nn.sigmoid(logits)
    p_t = y * p + (1.0 - y) * (1.0 - p)
    a_t = y * alpha + (1.0 - y) * (1.0 - alpha)
    return jnp.mean(a_t * (1.0 - p_t) ** gamma * bce)


def bce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    labels = labels.astype(jnp.float32)
    return jnp.mean(-(labels * jax.nn.log_sigmoid(logits)
                      + (1 - labels) * jax.nn.log_sigmoid(-logits)))
