"""Xception backbone in functional JAX (BASELINE config 5: "ViT/Xception
deepfake classifier" — Xception is the canonical FaceForensics++ deepfake
baseline; Chollet 2017 architecture, keras layer layout).

Same conventions as models/efficientnet.py: NHWC, pytree params, pure
functions, BN inference by default. Structure:

  entry : conv 32 s2 -> conv 64 -> blocks (128, 256, 728) each
          [relu?] sep -> bn -> relu -> sep -> bn -> maxpool3x3 s2,
          with a 1x1 s2 conv+bn residual (first block omits the leading relu)
  middle: 8 x identity-residual [relu sep728 bn] x 3
  exit  : block (728 -> 1024, maxpool, conv residual) -> sep1536 bn relu
          -> sep2048 bn relu -> GAP -> (2048,) features
  head  : Linear(2048 -> 1) fake logit (binary, like model.py's custom head
          downstream of the swap interface)

SeparableConv = depthwise 3x3 (no bias) + pointwise 1x1 (no bias), BN after
the pointwise only (keras semantics, depth multiplier 1). Trainable
parameter count matches keras Xception include_top=False: 20,806,952.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

_BN_EPS = 1e-3   # keras BatchNormalization default epsilon


@dataclasses.dataclass(frozen=True)
class XceptionSpec:
    middle_blocks: int = 8
    feature_dim: int = 2048


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return jax.random.normal(key, (kh, kw, cin, cout)) * jnp.sqrt(2.0 / fan_in)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _sep_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    # HWIO with feature_group_count=cin: (kh, kw, cin/groups=1, cout=cin)
    return {"dw": jax.random.normal(k1, (3, 3, 1, cin)) * jnp.sqrt(2.0 / 9.0),
            "pw": _conv_init(k2, 1, 1, cin, cout),
            "bn": _bn_init(cout)}


def init_params(key: jax.Array, spec: XceptionSpec = XceptionSpec()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {
        "conv1": {"w": _conv_init(next(keys), 3, 3, 3, 32), "bn": _bn_init(32)},
        "conv2": {"w": _conv_init(next(keys), 3, 3, 32, 64), "bn": _bn_init(64)},
    }
    entry = []
    cin = 64
    for cout in (128, 256, 728):
        entry.append({
            "sep1": _sep_init(next(keys), cin, cout),
            "sep2": _sep_init(next(keys), cout, cout),
            "res": {"w": _conv_init(next(keys), 1, 1, cin, cout),
                    "bn": _bn_init(cout)},
        })
        cin = cout
    p["entry"] = entry
    p["middle"] = [
        {f"sep{i}": _sep_init(next(keys), 728, 728) for i in (1, 2, 3)}
        for _ in range(spec.middle_blocks)
    ]
    p["exit"] = {
        "sep1": _sep_init(next(keys), 728, 728),
        "sep2": _sep_init(next(keys), 728, 1024),
        "res": {"w": _conv_init(next(keys), 1, 1, 728, 1024),
                "bn": _bn_init(1024)},
        "sep3": _sep_init(next(keys), 1024, 1536),
        "sep4": _sep_init(next(keys), 1536, spec.feature_dim),
    }
    p["head"] = {"w": jax.random.normal(next(keys), (spec.feature_dim, 1))
                 * jnp.sqrt(1.0 / spec.feature_dim),
                 "b": jnp.zeros((1,))}
    return p


def _bn_infer(x, bn, eps):
    inv = jax.lax.rsqrt(bn["var"] + eps)
    return (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _sep(x, sp, bn_apply):
    cin = x.shape[-1]
    x = jax.lax.conv_general_dilated(
        x, sp["dw"], (1, 1), "SAME", feature_group_count=cin,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _conv(x, sp["pw"])
    return bn_apply(x, sp["bn"], _BN_EPS)


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME")


def extract_features(params, x: jax.Array,
                     spec: XceptionSpec = XceptionSpec(), *, train=False,
                     batch_stats_out=None, bn_momentum=None) -> jax.Array:
    """(B, H, W, 3) normalized NHWC -> (B, 2048) pooled features.

    train=True with batch_stats_out: BN uses batch statistics and appends
    each site's updated running stats (forward execution order) — same
    contract as models/efficientnet.extract_features. bn_momentum=None is
    keras BatchNormalization's default (momentum 0.99 == torch 0.01); see
    TrainConfig.bn_momentum for the cold-start override."""
    if train and batch_stats_out is not None:
        from .efficientnet import batch_norm_train
        mom = 0.01 if bn_momentum is None else bn_momentum

        def bn_apply(v, bn, eps, _out=batch_stats_out):
            y, new = batch_norm_train(v, bn, eps, momentum=mom)
            _out.append(new)
            return y
    else:
        bn_apply = _bn_infer

    relu = jax.nn.relu
    h = relu(bn_apply(_conv(x, params["conv1"]["w"], stride=2, padding="VALID"),
                      params["conv1"]["bn"], _BN_EPS))
    h = relu(bn_apply(_conv(h, params["conv2"]["w"], padding="VALID"),
                      params["conv2"]["bn"], _BN_EPS))

    for i, blk in enumerate(params["entry"]):
        res = bn_apply(_conv(h, blk["res"]["w"], stride=2),
                       blk["res"]["bn"], _BN_EPS)
        if i > 0:
            h = relu(h)
        h = _sep(h, blk["sep1"], bn_apply)
        h = relu(h)
        h = _sep(h, blk["sep2"], bn_apply)
        h = _maxpool3s2(h)
        h = h + res

    for blk in params["middle"]:
        res = h
        for name in ("sep1", "sep2", "sep3"):
            h = _sep(relu(h), blk[name], bn_apply)
        h = h + res

    ex = params["exit"]
    res = bn_apply(_conv(h, ex["res"]["w"], stride=2), ex["res"]["bn"], _BN_EPS)
    h = _sep(relu(h), ex["sep1"], bn_apply)
    h = _sep(relu(h), ex["sep2"], bn_apply)
    h = _maxpool3s2(h) + res
    h = relu(_sep(h, ex["sep3"], bn_apply))
    h = relu(_sep(h, ex["sep4"], bn_apply))
    return jnp.mean(h, axis=(1, 2))


def forward(params, x: jax.Array,
            spec: XceptionSpec = XceptionSpec(), *, train=False) -> jax.Array:
    """(B, H, W, 3) -> (B, 1) fake logits."""
    feats = extract_features(params, x, spec)
    return feats @ params["head"]["w"] + params["head"]["b"]


def forward_train(params, x: jax.Array, spec: XceptionSpec, rng=None,
                  bn_momentum=None):
    """Training forward: batch-stat BN, stats returned as a flat list in
    forward order (consumed by update_bn_stats). Xception has no dropout."""
    stats: List[dict] = []
    feats = extract_features(params, x, spec, train=True,
                             batch_stats_out=stats, bn_momentum=bn_momentum)
    logits = feats @ params["head"]["w"] + params["head"]["b"]
    return logits, stats


def update_bn_stats(params, spec: XceptionSpec, stats: List[dict]):
    """Fold forward_train's flat stats list back into the param tree, in the
    same forward order: conv1, conv2, entry[i].(res, sep1, sep2), middle
    blocks' sep1..3, exit.(res, sep1, sep2, sep3, sep4)."""
    it = iter(stats)

    def take(bn):
        new = next(it)
        return {**bn, "mean": new["mean"], "var": new["var"]}

    def sep_take(sp):
        return {**sp, "bn": take(sp["bn"])}

    out = {
        "conv1": {**params["conv1"], "bn": take(params["conv1"]["bn"])},
        "conv2": {**params["conv2"], "bn": take(params["conv2"]["bn"])},
        "entry": [], "middle": [], "exit": None, "head": params["head"],
    }
    for blk in params["entry"]:
        out["entry"].append({
            "res": {**blk["res"], "bn": take(blk["res"]["bn"])},
            "sep1": sep_take(blk["sep1"]),
            "sep2": sep_take(blk["sep2"]),
        })
    for blk in params["middle"]:
        out["middle"].append(
            {name: sep_take(blk[name]) for name in ("sep1", "sep2", "sep3")})
    ex = params["exit"]
    out["exit"] = {
        "res": {**ex["res"], "bn": take(ex["res"]["bn"])},
        **{n: sep_take(ex[n]) for n in ("sep1", "sep2", "sep3", "sep4")},
    }
    rest = list(it)
    assert not rest, f"{len(rest)} unconsumed BN stats"
    return out


def n_trainable_params(params) -> int:
    """Trainable leaves (excludes BN running mean/var), for the published
    keras include_top=False count of 20,806,952 (+ the binary head here)."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("mean", "var"):
                    continue
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)
        else:
            total += int(node.size)

    walk(params)
    return total
