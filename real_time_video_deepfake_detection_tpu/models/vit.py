"""Vision Transformer classifier backbone (BASELINE config 5 swap).

Functional JAX ViT (patch embed -> pre-LN transformer -> mean-pool -> binary
head), sized S/16..L/16. Designed for SPMD from the start: qkv/mlp kernels
carry a head/hidden leading structure so `vit_partition_specs` can shard
them over a ("data","model") mesh (tensor parallelism for the larger
backbones, per SURVEY.md §2.3's TP note).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_SIZES = {
    # name: (depth, dim, heads, mlp_ratio, patch)
    "s16": (12, 384, 6, 4, 16),
    "b16": (12, 768, 12, 4, 16),
    "l16": (24, 1024, 16, 4, 16),
}


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    variant: str
    depth: int
    dim: int
    heads: int
    mlp_ratio: int
    patch: int
    image_size: int = 224
    # use_cls=True prepends a learned [CLS] token and takes it (post final
    # LN) as the feature vector instead of mean pooling — the transformers/
    # timm ViT convention, used by the donor-weight converter
    # (utils/vit_convert.py). ln_eps follows suit (HF default 1e-12).
    use_cls: bool = False
    ln_eps: float = 1e-6

    @staticmethod
    def make(variant: str = "s16", image_size: int = 224,
             use_cls: bool = False, ln_eps: float = 1e-6) -> "ViTSpec":
        d, dim, h, m, p = _SIZES[variant]
        return ViTSpec(variant, d, dim, h, m, p, image_size, use_cls, ln_eps)

    @property
    def n_tokens(self) -> int:
        return (self.image_size // self.patch) ** 2 + (1 if self.use_cls else 0)


def init_params(key: jax.Array, spec: ViTSpec, out_dim: int = 1) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 5 + 6 * spec.depth))
    dim, heads = spec.dim, spec.heads
    hd = dim // heads
    mlp = dim * spec.mlp_ratio

    def dense(k, cin, cout):
        return {"w": jax.random.normal(k, (cin, cout)) * math.sqrt(1.0 / cin),
                "b": jnp.zeros((cout,))}

    params = {
        "patch": dense(next(keys), spec.patch * spec.patch * 3, dim),
        "pos": jax.random.normal(next(keys), (spec.n_tokens, dim)) * 0.02,
        "blocks": [],
        "final_ln": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
        "head": dense(next(keys), dim, out_dim),
    }
    if spec.use_cls:
        params["cls"] = jax.random.normal(next(keys), (dim,)) * 0.02
    for _ in range(spec.depth):
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "qkv": {"w": jax.random.normal(next(keys), (dim, 3, heads, hd))
                    * math.sqrt(1.0 / dim),
                    "b": jnp.zeros((3, heads, hd))},
            "proj": dense(next(keys), dim, dim),
            "ln2": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "mlp1": dense(next(keys), dim, mlp),
            "mlp2": dense(next(keys), mlp, dim),
        })
    return params


def _ln(x, p, eps: float = 1e-6):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _attention(x, blk, heads):
    b, t, d = x.shape
    qkv = jnp.einsum("btd,dshc->bsthc", x, blk["qkv"]["w"]) + blk["qkv"]["b"][None, :, None]
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]     # (b, t, h, c)
    hd = d // heads
    attn = jnp.einsum("bthc,bshc->bhts", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhts,bshc->bthc", attn, v).reshape(b, t, d)
    return out @ blk["proj"]["w"] + blk["proj"]["b"]


def _encode(params, x, spec: ViTSpec):
    """Patchify + transformer encoder -> (B, T, D) tokens after final LN."""
    b, h, w, _ = x.shape
    p = spec.patch
    patches = x.reshape(b, h // p, p, w // p, p, 3)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, p * p * 3)
    tok = patches @ params["patch"]["w"] + params["patch"]["b"]
    if spec.use_cls:
        cls = jnp.broadcast_to(params["cls"], (b, 1, spec.dim))
        tok = jnp.concatenate([cls, tok], axis=1)
    tok = tok + params["pos"]

    eps = spec.ln_eps
    for blk in params["blocks"]:
        tok = tok + _attention(_ln(tok, blk["ln1"], eps), blk, spec.heads)
        y = _ln(tok, blk["ln2"], eps)
        # exact (erf) GELU — the transformers/timm donor convention; the
        # tanh approximation would break donor-weight numeric parity
        y = jax.nn.gelu(y @ blk["mlp1"]["w"] + blk["mlp1"]["b"],
                        approximate=False)
        tok = tok + (y @ blk["mlp2"]["w"] + blk["mlp2"]["b"])
    return _ln(tok, params["final_ln"], eps)


def extract_features(params, x, spec: ViTSpec):
    """Pre-head features: [CLS] token when spec.use_cls, else mean pool."""
    tok = _encode(params, x, spec)
    return tok[:, 0] if spec.use_cls else jnp.mean(tok, axis=1)


def forward(params, x, spec: ViTSpec):
    """x: (B, H, W, 3) normalized -> (B, out_dim) logits."""
    feats = extract_features(params, x, spec)
    return feats @ params["head"]["w"] + params["head"]["b"]


def vit_partition_specs(params) -> Dict[str, Any]:
    """PartitionSpec tree for a ("data", "model") mesh: attention heads and
    MLP hidden sharded over the model axis; everything else replicated.
    XLA inserts the all-reduces after proj/mlp2 contractions over ICI."""
    def block_spec(_blk):
        return {
            "ln1": {"scale": P(), "bias": P()},
            "qkv": {"w": P(None, None, "model", None),
                    "b": P(None, "model", None)},
            "proj": {"w": P(None, None), "b": P()},
            "ln2": {"scale": P(), "bias": P()},
            "mlp1": {"w": P(None, "model"), "b": P("model")},
            "mlp2": {"w": P("model", None), "b": P()},
        }

    out = {
        "patch": {"w": P(), "b": P()},
        "pos": P(),
        "blocks": [block_spec(b) for b in params["blocks"]],
        "final_ln": {"scale": P(), "bias": P()},
        "head": {"w": P(), "b": P()},
    }
    if "cls" in params:
        out["cls"] = P()
    return out
