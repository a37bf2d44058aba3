"""GradCAM for the EfficientNet classifier (reference C7's visualization
hook: deepfake_detection.py:5-7 imports pytorch_grad_cam and
model.get_feature_extractor exposes _conv_head — permanently disabled in the
reference serving path :543-544, but part of the capability surface).

In JAX this is a few lines: differentiate the fake logit w.r.t. the last
conv feature map, weight channels by the pooled gradients, ReLU, upsample."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .efficientnet import EfficientNetSpec, apply_head, swish, conv2d, \
    batch_norm_infer, _mbconv, _BN_EPS
from ..ops.resize import resize_bilinear_f32


def _features_to_head_conv(params, x, spec: EfficientNetSpec):
    """Backbone up to the post-head-conv activation map (B, H', W', 1280) —
    the reference's GradCAM target layer (model.py:100-102: _conv_head)."""
    h = swish(batch_norm_infer(conv2d(x, params["stem"]["conv"], stride=2),
                               params["stem"]["bn"], _BN_EPS))
    n = len(spec.blocks)
    for i, (blk, sb) in enumerate(zip(params["blocks"], spec.blocks)):
        h = _mbconv(h, blk, sb, train=False, rng=None, drop_rate=0.0,
                    bn_apply=batch_norm_infer)
    return swish(batch_norm_infer(conv2d(h, params["head"]["conv"]),
                                  params["head"]["bn"], _BN_EPS))


def gradcam(params, x: jax.Array, spec: EfficientNetSpec) -> jax.Array:
    """x: (B, 224, 224, 3) normalized -> (B, 224, 224) heatmaps in [0, 1]."""

    def logit_from_fmap(fmap):
        feats = jnp.mean(fmap, axis=(1, 2))
        return jnp.sum(apply_head(params, feats, train=False)[:, 0])

    fmap = _features_to_head_conv(params, x, spec)
    grads = jax.grad(logit_from_fmap)(fmap)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)   # (B,1,1,C)
    cam = jax.nn.relu(jnp.sum(fmap * weights, axis=-1))     # (B, h', w')

    lo = jnp.min(cam, axis=(1, 2), keepdims=True)
    hi = jnp.max(cam, axis=(1, 2), keepdims=True)
    cam = jnp.where(hi - lo > 1e-8, (cam - lo) / (hi - lo), jnp.zeros_like(cam))

    out = jax.vmap(lambda c: resize_bilinear_f32(c[..., None],
                                                 x.shape[1], x.shape[2])[..., 0])(cam)
    return out
