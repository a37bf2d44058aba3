"""keras Xception weights -> JAX pytree (config-5 backbone swap).

models/xception.py claims the keras layer layout (Chollet 2017,
keras.applications.xception). This converter makes the claim checkable and
the backbone loadable: any keras Xception model (include_top=False —
randomly initialized or carrying downloaded/fine-tuned weights) maps onto
our pytree, and tests/test_backbone_swap.py asserts numeric parity of the
pooled features against `model.predict` — the keras oracle the round-2
verdict asked for.

Mapping rules:
  Conv2D kernels are HWIO in keras and in our lax convs — copied verbatim.
  SeparableConv2D depthwise kernels are (kh, kw, cin, 1) in keras; our
  grouped conv takes (kh, kw, 1, cin) -> transpose the last two axes.
  BatchNormalization [gamma, beta, moving_mean, moving_var] -> scale/bias/
  mean/var; keras default epsilon 1e-3 == models/xception._BN_EPS.
  The four residual 1x1 convs (+ their BNs) are the UNNAMED Conv2D /
  BatchNormalization layers, taken in model.layers order: entry 128, 256,
  728, then exit 1024 — name-independent, so keras' global layer-name
  counters (conv2d_17, ...) never matter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.xception import XceptionSpec


def _bn_tree(layer):
    gamma, beta, mean, var = layer.get_weights()
    return {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta),
            "mean": jnp.asarray(mean), "var": jnp.asarray(var)}


def _sep_tree(sep_layer, bn_layer):
    dw, pw = sep_layer.get_weights()
    return {"dw": jnp.asarray(np.transpose(dw, (0, 1, 3, 2))),
            "pw": jnp.asarray(pw), "bn": _bn_tree(bn_layer)}


def from_keras(model, head_params: Optional[dict] = None
               ) -> Tuple[dict, XceptionSpec]:
    """keras Xception (include_top=False) -> (params, spec). `head_params`
    optionally supplies the binary head; zeros when omitted."""
    L = model.get_layer

    # the 4 unnamed residual convs/bns, in graph order
    res_convs = [l for l in model.layers
                 if type(l).__name__ == "Conv2D"
                 and not l.name.startswith("block")]
    res_bns = [l for l in model.layers
               if type(l).__name__ == "BatchNormalization"
               and not l.name.startswith("block")]
    if len(res_convs) != 4 or len(res_bns) != 4:
        raise ValueError(
            f"expected 4 unnamed residual conv/bn pairs, found "
            f"{len(res_convs)}/{len(res_bns)} — not a stock keras Xception")

    spec = XceptionSpec()
    params: dict = {
        "conv1": {"w": jnp.asarray(L("block1_conv1").get_weights()[0]),
                  "bn": _bn_tree(L("block1_conv1_bn"))},
        "conv2": {"w": jnp.asarray(L("block1_conv2").get_weights()[0]),
                  "bn": _bn_tree(L("block1_conv2_bn"))},
        "entry": [], "middle": [],
    }
    for i, blk in enumerate((2, 3, 4)):
        params["entry"].append({
            "sep1": _sep_tree(L(f"block{blk}_sepconv1"),
                              L(f"block{blk}_sepconv1_bn")),
            "sep2": _sep_tree(L(f"block{blk}_sepconv2"),
                              L(f"block{blk}_sepconv2_bn")),
            "res": {"w": jnp.asarray(res_convs[i].get_weights()[0]),
                    "bn": _bn_tree(res_bns[i])},
        })
    for blk in range(5, 5 + spec.middle_blocks):
        params["middle"].append({
            f"sep{j}": _sep_tree(L(f"block{blk}_sepconv{j}"),
                                 L(f"block{blk}_sepconv{j}_bn"))
            for j in (1, 2, 3)
        })
    params["exit"] = {
        "sep1": _sep_tree(L("block13_sepconv1"), L("block13_sepconv1_bn")),
        "sep2": _sep_tree(L("block13_sepconv2"), L("block13_sepconv2_bn")),
        "res": {"w": jnp.asarray(res_convs[3].get_weights()[0]),
                "bn": _bn_tree(res_bns[3])},
        "sep3": _sep_tree(L("block14_sepconv1"), L("block14_sepconv1_bn")),
        "sep4": _sep_tree(L("block14_sepconv2"), L("block14_sepconv2_bn")),
    }
    params["head"] = (head_params if head_params is not None
                      else {"w": jnp.zeros((spec.feature_dim, 1)),
                            "b": jnp.zeros((1,))})
    return params, spec


def from_h5(path: str, head_params: Optional[dict] = None
            ) -> Tuple[dict, XceptionSpec]:
    """Build a weightless keras Xception, load an .h5 weight file into it,
    convert."""
    import keras
    model = keras.applications.Xception(weights=None, include_top=False,
                                        input_shape=(None, None, 3))
    model.load_weights(path)
    return from_keras(model, head_params=head_params)
