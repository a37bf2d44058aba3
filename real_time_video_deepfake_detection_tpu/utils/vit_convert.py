"""transformers ViT checkpoint -> JAX ViT pytree (config-5 backbone swap).

The reference ships a torch->our-B0 converter drill (utils/torch_convert.py,
mirroring deepfake_detection.py:44-70's checkpoint loading); this module is
the same bridge for the ViT backbone: any HuggingFace `ViTModel` state dict
(google/vit-base-patch16-224 and kin, or a locally fine-tuned one) converts
to the models/vit.py pytree with numeric parity (tests/test_backbone_swap.py
asserts our encoder output matches `ViTModel.forward().last_hidden_state`).

Convention notes (why the spec flips):
  - HF ViT prepends a [CLS] token and takes it as the representation ->
    spec.use_cls=True (pos table is (n_patches+1, dim), row 0 = CLS)
  - HF layer_norm_eps default is 1e-12 (ours 1e-6) -> carried into the spec
  - HF hidden_act "gelu" is the exact erf GELU -> models/vit.py uses
    approximate=False
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.vit import ViTSpec


def _t(x) -> np.ndarray:
    """torch tensor / array -> numpy f32."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def convert_vit_state_dict(sd: Dict[str, Any], *, hidden_size: int,
                           num_layers: int, num_heads: int, patch: int,
                           image_size: int, mlp_dim: int,
                           ln_eps: float = 1e-12,
                           head_params: Optional[dict] = None
                           ) -> Tuple[dict, ViTSpec]:
    """HF ViTModel state dict -> (params, spec).

    `head_params` optionally supplies the binary fake-logit head
    ({"w": (dim, 1), "b": (1,)}); zeros when omitted (donor backbones carry
    no deepfake head — fine-tune or load one separately)."""
    d, heads = hidden_size, num_heads
    hd = d // heads
    if mlp_dim != 4 * d:
        raise ValueError(f"mlp_dim {mlp_dim} != 4*hidden ({4 * d}): "
                         "models/vit.py assumes the standard 4x MLP")
    variant = {384: "s16", 768: "b16", 1024: "l16"}.get(d)
    if variant is None:
        # non-catalog size: synthesize a spec directly
        spec = ViTSpec("custom", num_layers, d, heads, 4, patch, image_size,
                       use_cls=True, ln_eps=ln_eps)
    else:
        spec = ViTSpec(variant, num_layers, d, heads, 4, patch, image_size,
                       use_cls=True, ln_eps=ln_eps)

    g = lambda k: _t(sd[k])
    proj = g("embeddings.patch_embeddings.projection.weight")  # (D,3,P,P)
    params: dict = {
        # conv projection -> matmul over (p_row, p_col, channel)-flattened
        # patches (models/vit.py _encode patchify order)
        "patch": {"w": jnp.asarray(proj.transpose(2, 3, 1, 0)
                                   .reshape(patch * patch * 3, d)),
                  "b": jnp.asarray(
                      g("embeddings.patch_embeddings.projection.bias"))},
        "cls": jnp.asarray(g("embeddings.cls_token").reshape(d)),
        "pos": jnp.asarray(
            g("embeddings.position_embeddings").reshape(-1, d)),
        "blocks": [],
        "final_ln": {"scale": jnp.asarray(g("layernorm.weight")),
                     "bias": jnp.asarray(g("layernorm.bias"))},
        "head": (head_params if head_params is not None
                 else {"w": jnp.zeros((d, 1)), "b": jnp.zeros((1,))}),
    }

    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        att = (p + "attention.attention."
               if p + "attention.attention.query.weight" in sd
               else p + "attention.self.")
        # torch Linear weight is (out, in); out axis is (head, hd)-major
        wq, wk, wv = (g(att + f"{n}.weight") for n in ("query", "key", "value"))
        bq, bk, bv = (g(att + f"{n}.bias") for n in ("query", "key", "value"))
        qkv_w = np.stack([wq, wk, wv])            # (3, D_out, D_in)
        qkv_w = qkv_w.reshape(3, heads, hd, d).transpose(3, 0, 1, 2)
        qkv_b = np.stack([bq, bk, bv]).reshape(3, heads, hd)
        params["blocks"].append({
            "ln1": {"scale": jnp.asarray(g(p + "layernorm_before.weight")),
                    "bias": jnp.asarray(g(p + "layernorm_before.bias"))},
            "qkv": {"w": jnp.asarray(qkv_w), "b": jnp.asarray(qkv_b)},
            "proj": {"w": jnp.asarray(
                         g(p + "attention.output.dense.weight").T),
                     "b": jnp.asarray(g(p + "attention.output.dense.bias"))},
            "ln2": {"scale": jnp.asarray(g(p + "layernorm_after.weight")),
                    "bias": jnp.asarray(g(p + "layernorm_after.bias"))},
            "mlp1": {"w": jnp.asarray(g(p + "intermediate.dense.weight").T),
                     "b": jnp.asarray(g(p + "intermediate.dense.bias"))},
            "mlp2": {"w": jnp.asarray(g(p + "output.dense.weight").T),
                     "b": jnp.asarray(g(p + "output.dense.bias"))},
        })
    return params, spec


def from_transformers(model, head_params: Optional[dict] = None
                      ) -> Tuple[dict, ViTSpec]:
    """transformers.ViTModel (or ViTForImageClassification.vit) instance ->
    (params, spec)."""
    cfg = model.config
    sd = {k: v for k, v in model.state_dict().items()}
    return convert_vit_state_dict(
        sd, hidden_size=cfg.hidden_size, num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads, patch=cfg.patch_size,
        image_size=cfg.image_size, mlp_dim=cfg.intermediate_size,
        ln_eps=cfg.layer_norm_eps, head_params=head_params)


def from_pretrained(path: str, head_params: Optional[dict] = None
                    ) -> Tuple[dict, ViTSpec]:
    """Load a local HF ViT checkpoint directory and convert."""
    from transformers import ViTModel
    return from_transformers(ViTModel.from_pretrained(path),
                             head_params=head_params)
