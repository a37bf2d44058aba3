"""Training losses (reference train.py:360-392: FocalLoss with label
smoothing on binary logits)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss_with_smoothing(logits: jax.Array, labels: jax.Array,
                              gamma: float = 2.0, alpha: float = 0.25,
                              label_smoothing: float = 0.1) -> jax.Array:
    """Binary focal loss, mean-reduced.

    Matches the reference semantics (train.py:360-392): targets smoothed to
    y*(1-ls)+0.5*ls, p = sigmoid(logit), focal weight (1-p_t)^gamma, class
    balance alpha for positives / (1-alpha) for negatives.
    """
    labels = labels.astype(jnp.float32)
    y = labels * (1.0 - label_smoothing) + 0.5 * label_smoothing
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    bce = -(y * log_p + (1.0 - y) * log_not_p)
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    a_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
    return jnp.mean(a_t * (1.0 - p_t) ** gamma * bce)


def bce_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    labels = labels.astype(jnp.float32)
    return jnp.mean(-(labels * jax.nn.log_sigmoid(logits)
                      + (1 - labels) * jax.nn.log_sigmoid(-logits)))
