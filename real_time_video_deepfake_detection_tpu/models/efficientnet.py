"""EfficientNet (B0..B7) as pure functional JAX, NHWC, TPU-first.

From-scratch implementation of the classifier backbone the reference uses
(model.py:21-102: EfficientNet-B0 + custom 1280->512->256->1 head). Layout and
naming are chosen so weights from the reference's `best_model.pth` torch
checkpoint map 1:1 (see utils/torch_convert.py); behavioral spec:

  stem conv3x3 s2 -> 16 MBConv blocks in 7 stages (expand 1/6, k3/k5,
  SE ratio 0.25, swish, BN eps 1e-3) -> head conv1x1 -> 1280 -> global avg
  pool -> head: Dropout(.5) Linear(1280,512) BN1d ReLU Dropout(.35)
  Linear(512,256) BN1d ReLU Dropout(.25) Linear(256,1)   [model.py:50-61]

Everything is expressed with lax.conv_general_dilated in NHWC so XLA tiles
convs directly onto the MXU; params/batch-stats are plain nested dicts (pjit
partitions them with a trivial PartitionSpec tree). Dropout and stochastic
depth take explicit PRNG keys (training only).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters)
_B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]

# (width_coefficient, depth_coefficient, resolution, dropout_rate)
_SCALING = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

_BN_EPS = 1e-3          # backbone BN (efficientnet convention)
_HEAD_BN_EPS = 1e-5     # torch BatchNorm1d default (reference head)
_SE_RATIO = 0.25
_DROP_CONNECT = 0.2


def round_filters(filters: int, width: float) -> int:
    filters *= width
    divisor = 8
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    kernel: int
    stride: int
    expand: int
    cin: int
    cout: int


@dataclasses.dataclass(frozen=True)
class EfficientNetSpec:
    variant: str
    stem_filters: int
    head_filters: int
    blocks: Tuple[BlockSpec, ...]
    resolution: int
    dropout: float

    @staticmethod
    def make(variant: str = "b0") -> "EfficientNetSpec":
        width, depth, res, drop = _SCALING[variant]
        blocks: List[BlockSpec] = []
        for (r, k, s, e, ci, co) in _B0_BLOCKS:
            ci, co = round_filters(ci, width), round_filters(co, width)
            for j in range(round_repeats(r, depth)):
                blocks.append(BlockSpec(
                    kernel=k, stride=s if j == 0 else 1, expand=e,
                    cin=ci if j == 0 else co, cout=co))
        return EfficientNetSpec(
            variant=variant,
            stem_filters=round_filters(32, width),
            head_filters=round_filters(1280, width),
            blocks=tuple(blocks),
            resolution=res,
            dropout=drop,
        )


# ----------------------------------------------------------------- primitives

def swish(x):
    return x * jax.nn.sigmoid(x)


def conv2d(x, w, stride=1, groups=1):
    """NHWC conv with TF-style SAME padding (matches the reference's
    static-same-padding convs)."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def batch_norm_infer(x, bn, eps):
    inv = jax.lax.rsqrt(bn["var"] + eps)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def batch_norm_train(x, bn, eps, momentum=0.01):
    """Returns (y, new_stats). Reduces over all axes but the channel axis."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv * bn["scale"] + bn["bias"]
    n = x.size // x.shape[-1]
    # torch running_var uses the unbiased estimator
    unbiased = var * n / max(n - 1, 1)
    new = {
        "mean": (1 - momentum) * bn["mean"] + momentum * mean,
        "var": (1 - momentum) * bn["var"] + momentum * unbiased,
        "scale": bn["scale"], "bias": bn["bias"],
    }
    return y, new


def _bn_params(c, rng=None):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _conv_init(key, kh, kw, cin, cout, groups=1):
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin // groups, cout), jnp.float32) * std


def _linear_init(key, cin, cout):
    bound = 1.0 / math.sqrt(cin)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)}


# --------------------------------------------------------------------- params

def init_params(key: jax.Array, spec: EfficientNetSpec,
                head_dims=(512, 256, 1)) -> Dict[str, Any]:
    """Random init of the full model (backbone + reference's custom head)."""
    keys = iter(jax.random.split(key, 8 + 8 * len(spec.blocks)))
    params: Dict[str, Any] = {
        "stem": {"conv": _conv_init(next(keys), 3, 3, 3, spec.stem_filters),
                 "bn": _bn_params(spec.stem_filters)},
        "blocks": [],
        "head": {"conv": _conv_init(next(keys), 1, 1, spec.blocks[-1].cout,
                                    spec.head_filters),
                 "bn": _bn_params(spec.head_filters)},
    }
    for b in spec.blocks:
        cexp = b.cin * b.expand
        nsq = max(1, int(b.cin * _SE_RATIO))
        blk: Dict[str, Any] = {}
        if b.expand != 1:
            blk["expand_conv"] = _conv_init(next(keys), 1, 1, b.cin, cexp)
            blk["bn0"] = _bn_params(cexp)
        blk["depthwise"] = _conv_init(next(keys), b.kernel, b.kernel, cexp, cexp,
                                      groups=cexp)
        blk["bn1"] = _bn_params(cexp)
        blk["se_reduce"] = {"w": _conv_init(next(keys), 1, 1, cexp, nsq),
                            "b": jnp.zeros((nsq,), jnp.float32)}
        blk["se_expand"] = {"w": _conv_init(next(keys), 1, 1, nsq, cexp),
                            "b": jnp.zeros((cexp,), jnp.float32)}
        blk["project"] = _conv_init(next(keys), 1, 1, cexp, b.cout)
        blk["bn2"] = _bn_params(b.cout)
        params["blocks"].append(blk)

    d0, d1, d2 = head_dims
    params["fc"] = {
        "fc1": _linear_init(next(keys), spec.head_filters, d0),
        "bn1": _bn_params(d0),
        "fc2": _linear_init(next(keys), d0, d1),
        "bn2": _bn_params(d1),
        "fc3": _linear_init(next(keys), d1, d2),
    }
    return params


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# -------------------------------------------------------------------- forward

def _mbconv(x, blk, spec_b: BlockSpec, *, train, rng, drop_rate, bn_apply):
    inp = x
    if spec_b.expand != 1:
        x = bn_apply(conv2d(x, blk["expand_conv"]), blk["bn0"], _BN_EPS)
        x = swish(x)
    cexp = x.shape[-1]
    x = bn_apply(conv2d(x, blk["depthwise"], stride=spec_b.stride, groups=cexp),
                 blk["bn1"], _BN_EPS)
    x = swish(x)

    # Squeeze-excite
    se = jnp.mean(x, axis=(1, 2), keepdims=True)
    se = conv2d(se, blk["se_reduce"]["w"]) + blk["se_reduce"]["b"]
    se = swish(se)
    se = conv2d(se, blk["se_expand"]["w"]) + blk["se_expand"]["b"]
    x = jax.nn.sigmoid(se) * x

    x = bn_apply(conv2d(x, blk["project"]), blk["bn2"], _BN_EPS)

    if spec_b.stride == 1 and spec_b.cin == spec_b.cout:
        if train and drop_rate > 0.0 and rng is not None:
            keep = 1.0 - drop_rate
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = x * mask / keep
        x = x + inp
    return x


def extract_features(params, x, spec: EfficientNetSpec, *, train=False,
                     rng=None, batch_stats_out=None, bn_momentum=None):
    """Backbone up to the 1280-d pooled feature vector
    (reference model.py:74-88). `bn_momentum=None` keeps
    efficientnet_pytorch's 0.01; cold-start training (no pretrained
    running stats) wants a larger value — see TrainConfig.bn_momentum."""
    if train and batch_stats_out is not None:
        mom = 0.01 if bn_momentum is None else bn_momentum

        def bn_apply(v, bn, eps, _out=batch_stats_out):
            y, new = batch_norm_train(v, bn, eps, momentum=mom)
            _out.append(new)
            return y
    else:
        bn_apply = batch_norm_infer

    x = swish(bn_apply(conv2d(x, params["stem"]["conv"], stride=2),
                       params["stem"]["bn"], _BN_EPS))
    n = len(spec.blocks)
    rngs = jax.random.split(rng, n) if (train and rng is not None) else [None] * n
    for i, (blk, sb) in enumerate(zip(params["blocks"], spec.blocks)):
        drop = _DROP_CONNECT * i / n
        x = _mbconv(x, blk, sb, train=train, rng=rngs[i], drop_rate=drop,
                    bn_apply=bn_apply)
    x = swish(bn_apply(conv2d(x, params["head"]["conv"]),
                       params["head"]["bn"], _BN_EPS))
    return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, head_filters)


def apply_head(params, feats, *, train=False, rng=None, dropout=0.5,
               batch_stats_out=None, bn_momentum=None):
    """The reference's custom classifier head (model.py:50-61)."""
    if train and batch_stats_out is not None:
        # nn.BatchNorm1d default momentum is 0.1 (the backbone's 0.01 is
        # efficientnet_pytorch's batch_norm_momentum=0.99 convention)
        mom = 0.1 if bn_momentum is None else bn_momentum

        def bn_apply(v, bn, eps, _out=batch_stats_out):
            y, new = batch_norm_train(v, bn, eps, momentum=mom)
            _out.append(new)
            return y
    else:
        bn_apply = batch_norm_infer

    fc = params["fc"]
    rngs = jax.random.split(rng, 3) if (train and rng is not None) else [None] * 3

    def drop(v, rate, key):
        if not train or key is None or rate <= 0.0:
            return v
        keep = 1.0 - rate
        return v * jax.random.bernoulli(key, keep, v.shape) / keep

    x = drop(feats, dropout, rngs[0])
    x = x @ fc["fc1"]["w"] + fc["fc1"]["b"]
    x = jax.nn.relu(bn_apply(x, fc["bn1"], _HEAD_BN_EPS))
    x = drop(x, dropout * 0.7, rngs[1])
    x = x @ fc["fc2"]["w"] + fc["fc2"]["b"]
    x = jax.nn.relu(bn_apply(x, fc["bn2"], _HEAD_BN_EPS))
    x = drop(x, dropout * 0.5, rngs[2])
    return x @ fc["fc3"]["w"] + fc["fc3"]["b"]


def forward(params, x, spec: EfficientNetSpec, *, train=False, rng=None,
            dropout=0.5):
    """Full model: NHWC normalized RGB -> (B, 1) logits
    (reference model.py:63-72). Inference mode is fully deterministic."""
    if train:
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
    else:
        r1 = r2 = None
    feats = extract_features(params, x, spec, train=train, rng=r1)
    return apply_head(params, feats, train=train, rng=r2, dropout=dropout)


def update_bn_stats(params, spec: EfficientNetSpec, stats: List[dict]):
    """Fold the flat batch-stats list from forward_train back into the param
    tree (same traversal order: stem.bn, per-block [bn0?, bn1, bn2], head.bn,
    fc.bn1, fc.bn2). Only mean/var are taken; scale/bias stay with the
    optimizer-updated params."""
    it = iter(stats)

    def take(bn):
        new = next(it)
        return {**bn, "mean": new["mean"], "var": new["var"]}

    out = {
        "stem": {**params["stem"], "bn": take(params["stem"]["bn"])},
        "blocks": [],
        "head": None, "fc": None,
    }
    for blk, sb in zip(params["blocks"], spec.blocks):
        nb = dict(blk)
        if sb.expand != 1:
            nb["bn0"] = take(blk["bn0"])
        nb["bn1"] = take(blk["bn1"])
        nb["bn2"] = take(blk["bn2"])
        out["blocks"].append(nb)
    out["head"] = {**params["head"], "bn": take(params["head"]["bn"])}
    fc = dict(params["fc"])
    fc["bn1"] = take(fc["bn1"])
    fc["bn2"] = take(fc["bn2"])
    out["fc"] = fc
    return out


def forward_train(params, x, spec: EfficientNetSpec, rng, dropout=0.5,
                  bn_momentum=None):
    """Training forward that also returns updated batch-norm statistics as a
    flat list in traversal order (consumed by train/ to rebuild the tree)."""
    stats: List[dict] = []
    r1, r2 = jax.random.split(rng)
    feats = extract_features(params, x, spec, train=True, rng=r1,
                             batch_stats_out=stats, bn_momentum=bn_momentum)
    logits = apply_head(params, feats, train=True, rng=r2, dropout=dropout,
                        batch_stats_out=stats, bn_momentum=bn_momentum)
    return logits, stats
