"""Backbone swap layer (BASELINE config 5, SURVEY.md §7 step 8).

The reference hard-codes EfficientNet-B0 (model.py:21-102). Here every
consumer — the batched serving tick (serving/batcher.py), the single-stream
classifier (pipeline/classify.py), and the trainer (train/steps.py,
train/trainer.py) — goes through this dispatch module, so the classifier
backbone is selected by name behind one interface:

    b0..b7      EfficientNet (models/efficientnet.py; reference-parity)
    vit_s16/b16/l16  Vision Transformer (models/vit.py; TP-shardable)
    xception    Xception (models/xception.py; FF++ canonical baseline)

Specs are frozen hashable dataclasses, so they remain valid jit static
arguments everywhere an EfficientNetSpec used to be.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax

from . import efficientnet as _eff
from . import vit as _vit
from . import xception as _xcp
from .efficientnet import EfficientNetSpec
from .vit import ViTSpec
from .xception import XceptionSpec

_EFF_NAMES = tuple(f"b{i}" for i in range(8))
_VIT_NAMES = ("vit_s16", "vit_b16", "vit_l16")


def backbone_names() -> List[str]:
    """CLI choices (trainer --backbone, server --backbone)."""
    return list(_EFF_NAMES) + list(_VIT_NAMES) + ["xception"]


def make(name: str, image_size: int = 224):
    """Backbone name -> frozen spec."""
    if name in _EFF_NAMES:
        return EfficientNetSpec.make(name)
    if name in _VIT_NAMES:
        return ViTSpec.make(name.split("_", 1)[1], image_size=image_size)
    if name == "xception":
        return XceptionSpec()
    raise ValueError(f"unknown backbone {name!r} "
                     f"(choices: {backbone_names()})")


def feature_dim(spec) -> int:
    """Pooled-feature width — what the clip-attention temporal head consumes
    (DetectorConfig.clip_feature_dim is inferred from this)."""
    if isinstance(spec, EfficientNetSpec):
        return spec.head_filters
    if isinstance(spec, ViTSpec):
        return spec.dim
    if isinstance(spec, XceptionSpec):
        return spec.feature_dim
    raise TypeError(f"not a backbone spec: {type(spec)}")


def init_params(key: jax.Array, spec):
    if isinstance(spec, EfficientNetSpec):
        return _eff.init_params(key, spec)
    if isinstance(spec, ViTSpec):
        return _vit.init_params(key, spec)
    if isinstance(spec, XceptionSpec):
        return _xcp.init_params(key, spec)
    raise TypeError(f"not a backbone spec: {type(spec)}")


def extract_features(params, x, spec, *, train: bool = False):
    """(B, H, W, 3) normalized NHWC -> (B, feature_dim) pooled features
    (inference mode — training goes through forward_train)."""
    if isinstance(spec, EfficientNetSpec):
        return _eff.extract_features(params, x, spec, train=train)
    if isinstance(spec, ViTSpec):
        return _vit.extract_features(params, x, spec)
    if isinstance(spec, XceptionSpec):
        return _xcp.extract_features(params, x, spec, train=train)
    raise TypeError(f"not a backbone spec: {type(spec)}")


def apply_head(params, feats, spec, *, train: bool = False):
    """(B, feature_dim) -> (B, 1) fake logits."""
    if isinstance(spec, EfficientNetSpec):
        return _eff.apply_head(params, feats, train=train)
    # ViT and Xception use a plain linear head
    return feats @ params["head"]["w"] + params["head"]["b"]


def forward(params, x, spec, *, train: bool = False, rng=None):
    if isinstance(spec, EfficientNetSpec):
        return _eff.forward(params, x, spec, train=train, rng=rng)
    if isinstance(spec, ViTSpec):
        return _vit.forward(params, x, spec)
    if isinstance(spec, XceptionSpec):
        return _xcp.forward(params, x, spec, train=train)
    raise TypeError(f"not a backbone spec: {type(spec)}")


def forward_train(params, x, spec, rng, dropout: float = 0.5,
                  bn_momentum=None) -> Tuple[jax.Array, list]:
    """Training forward: (logits, flat BN-stats list) — [] for BN-free
    backbones (ViT). `dropout` is the custom head's base rate
    (reference model.py:51-59 / train.py --dropout); ViT and Xception use
    plain linear heads with no dropout, so it is ignored for them.
    `bn_momentum=None` keeps each architecture's donor default (0.01
    backbone / 0.1 torch BatchNorm1d head); see TrainConfig.bn_momentum."""
    if isinstance(spec, EfficientNetSpec):
        return _eff.forward_train(params, x, spec, rng, dropout=dropout,
                                  bn_momentum=bn_momentum)
    if isinstance(spec, ViTSpec):
        return _vit.forward(params, x, spec), []
    if isinstance(spec, XceptionSpec):
        return _xcp.forward_train(params, x, spec, rng,
                                  bn_momentum=bn_momentum)
    raise TypeError(f"not a backbone spec: {type(spec)}")


def update_bn_stats(params, spec, stats: list):
    if not stats:
        return params
    if isinstance(spec, EfficientNetSpec):
        return _eff.update_bn_stats(params, spec, stats)
    if isinstance(spec, XceptionSpec):
        return _xcp.update_bn_stats(params, spec, stats)
    raise TypeError(f"unexpected BN stats for spec {type(spec)}")


def n_blocks(spec) -> int:
    """Depth unit used by the freeze-fraction optimizer masking
    (train/steps.make_optimizer; reference train.py:863-876)."""
    if isinstance(spec, EfficientNetSpec):
        return len(spec.blocks)
    if isinstance(spec, ViTSpec):
        return spec.depth
    if isinstance(spec, XceptionSpec):
        return spec.middle_blocks
    raise TypeError(f"not a backbone spec: {type(spec)}")


def lr_group(spec, path, n_frozen: int) -> str:
    """Optimizer group for a parameter path: "head" (full LR), "frozen"
    (no updates — the stem analogue + the first n_frozen blocks), or
    "backbone" (0.1x LR). Generalizes the reference's EfficientNet freezing
    (train.py:863-876) to every backbone."""
    top = getattr(path[0], "key", None)
    if isinstance(spec, EfficientNetSpec):
        if top == "fc":
            return "head"
        if top == "stem":
            return "frozen"
        if top == "blocks":
            idx = getattr(path[1], "idx", None)
            if idx is not None and idx < n_frozen:
                return "frozen"
        return "backbone"
    if isinstance(spec, ViTSpec):
        if top == "head":
            return "head"
        if top in ("patch", "pos", "cls"):
            return "frozen"
        if top == "blocks":
            idx = getattr(path[1], "idx", None)
            if idx is not None and idx < n_frozen:
                return "frozen"
        return "backbone"
    if isinstance(spec, XceptionSpec):
        if top == "head":
            return "head"
        if top in ("conv1", "conv2", "entry"):
            return "frozen"
        if top == "middle":
            idx = getattr(path[1], "idx", None)
            if idx is not None and idx < n_frozen:
                return "frozen"
        return "backbone"
    raise TypeError(f"not a backbone spec: {type(spec)}")


def partition_specs(params, spec):
    """PartitionSpec tree for a ("data", "model") mesh, or None when the
    backbone has no TP sharding defined (params then replicate)."""
    if isinstance(spec, ViTSpec):
        return _vit.vit_partition_specs(params)
    return None
