"""PyTorch checkpoint -> JAX pytree weight converters.

Loads the reference's `weights/best_model.pth` (a torch checkpoint holding
`model_state_dict` with `net._conv_stem.*`, `net._blocks.{i}.*`,
`net._fc.{1,2,5,6,9}.*` keys — reference deepfake_detection.py:44-70,
model.py:48-61) into the functional-JAX EfficientNet param tree of
models/efficientnet.py. Torch is used only for deserialization on the host;
no torch compute.

Conversions:
  conv OIHW -> HWIO; depthwise (C,1,k,k) -> (k,k,1,C); linear (out,in) -> (in,out)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.efficientnet import EfficientNetSpec, init_params


def _numpy_safe_globals():
    """The closed set of non-default globals a reference checkpoint needs:
    numpy array/scalar reconstructors for the `rng_numpy` capture
    (np.random.get_state() embeds an ndarray — reference train.py:699).
    Everything the reference writes besides tensors is primitives/dicts
    (train.py:688-709 resume state, train.py:1034-1055 best_model.pth),
    so tensors + primitives + this set is sufficient."""
    import numpy.dtypes as _ndt
    allow = [np.ndarray, np.dtype]
    allow += [getattr(_ndt, n) for n in dir(_ndt) if n.endswith("DType")]
    for mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
        try:  # numpy 1.x vs 2.x module path
            m = __import__(mod, fromlist=["_reconstruct", "scalar"])
            allow += [m._reconstruct, m.scalar]
        except Exception:
            pass
    return allow


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], dict]:
    """Read a torch checkpoint file -> (tensor dict as numpy, full ckpt
    dict for metadata extraction). Host-side only.

    Checkpoint paths are operator-supplied (serving --weights, trainer
    --warm-start), so this never falls back to a full unpickle: it loads
    with weights_only=True plus the closed numpy allowlist above, which
    covers every artifact the reference writes. A file that needs more
    than that is refused (torch raises UnpicklingError naming the global).
    """
    import torch  # local import: torch is a host-side tool, not a dependency
    safe_globals = getattr(torch.serialization, "safe_globals", None)
    if safe_globals is None:  # pragma: no cover - torch >= 2.4 in this image
        # torch < 2.4 has no safe_globals context; weights_only still works
        # but can't admit the numpy RNG-capture reconstructors, and we will
        # not widen to a full unpickle — fail with a readable requirement.
        raise RuntimeError(
            "loading .pth checkpoints safely requires torch >= 2.4 "
            f"(installed torch has no torch.serialization.safe_globals); "
            f"refusing to unpickle {path} without an allowlist")
    with safe_globals(_numpy_safe_globals()):
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state = ckpt
    if isinstance(ckpt, dict):
        for wrap in ("model_state_dict", "state_dict"):
            if isinstance(ckpt.get(wrap), dict):
                state = ckpt[wrap]
                break
    # Keep only tensor values: a wrapped checkpoint's top level mixes the
    # state dict with ints/floats/metadata (reference train.py:685-712), and
    # mapping .detach() over those would crash with an opaque AttributeError.
    tensors = {k: v.detach().cpu().numpy() for k, v in state.items()
               if hasattr(v, "detach")}
    if not tensors:
        raise ValueError(
            f"{path}: checkpoint contains no tensors (keys: "
            f"{sorted(state)[:5]}); expected a state dict or a checkpoint "
            "wrapping one under 'model_state_dict'/'state_dict'")
    return tensors, (ckpt if isinstance(ckpt, dict) else {})


def _conv(sd, key):
    return jnp.asarray(np.transpose(sd[key], (2, 3, 1, 0)))


def _bn(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def _linear(sd, prefix):
    return {"w": jnp.asarray(sd[f"{prefix}.weight"].T),
            "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _convert_backbone(sd: Mapping[str, np.ndarray],
                      spec: EfficientNetSpec) -> Dict[str, Any]:
    """Backbone (stem/blocks/head-conv) from reference-naming keys."""
    params: Dict[str, Any] = {
        "stem": {"conv": _conv(sd, "net._conv_stem.weight"),
                 "bn": _bn(sd, "net._bn0")},
        "blocks": [],
        "head": {"conv": _conv(sd, "net._conv_head.weight"),
                 "bn": _bn(sd, "net._bn1")},
    }
    for i, b in enumerate(spec.blocks):
        p = f"net._blocks.{i}"
        blk: Dict[str, Any] = {}
        if b.expand != 1:
            blk["expand_conv"] = _conv(sd, f"{p}._expand_conv.weight")
            blk["bn0"] = _bn(sd, f"{p}._bn0")
        blk["depthwise"] = _conv(sd, f"{p}._depthwise_conv.weight")
        blk["bn1"] = _bn(sd, f"{p}._bn1")
        blk["se_reduce"] = {"w": _conv(sd, f"{p}._se_reduce.weight"),
                            "b": jnp.asarray(sd[f"{p}._se_reduce.bias"])}
        blk["se_expand"] = {"w": _conv(sd, f"{p}._se_expand.weight"),
                            "b": jnp.asarray(sd[f"{p}._se_expand.bias"])}
        blk["project"] = _conv(sd, f"{p}._project_conv.weight")
        blk["bn2"] = _bn(sd, f"{p}._bn2")
        params["blocks"].append(blk)
    return params


def convert_state_dict(sd: Mapping[str, np.ndarray],
                       spec: EfficientNetSpec) -> Dict[str, Any]:
    """torch state dict (reference naming) -> JAX param pytree."""
    params = _convert_backbone(sd, spec)
    params["fc"] = {
        "fc1": _linear(sd, "net._fc.1"),
        "bn1": _bn(sd, "net._fc.2"),
        "fc2": _linear(sd, "net._fc.5"),
        "bn2": _bn(sd, "net._fc.6"),
        "fc3": _linear(sd, "net._fc.9"),
    }
    return params


# ------------------------------------------------- ImageNet-pretrained inits

def _stage_indices(spec: EfficientNetSpec):
    """flat block index -> (stage, within-stage) for timm's nested naming."""
    from ..models.efficientnet import _B0_BLOCKS, _SCALING, round_repeats
    depth = _SCALING[spec.variant][1]
    out = []
    for s, (r, *_rest) in enumerate(_B0_BLOCKS):
        for j in range(round_repeats(r, depth)):
            out.append((s, j))
    assert len(out) == len(spec.blocks)
    return out


def detect_state_dict_schema(sd: Mapping[str, np.ndarray]) -> str:
    """'reference' (net._* + 5-layer custom head), 'effnet_pytorch'
    (bare _conv_stem.* ImageNet release file, single-Linear _fc), or
    'timm' (conv_stem.* / blocks.{s}.{j}.*)."""
    if "net._conv_stem.weight" in sd:
        return "reference"
    if "_conv_stem.weight" in sd:
        return "effnet_pytorch"
    if "conv_stem.weight" in sd:
        return "timm"
    raise ValueError(
        "unrecognized EfficientNet state-dict schema; expected reference "
        "(net._*), efficientnet_pytorch (_conv_stem.*) or timm "
        f"(conv_stem.*) keys, got e.g. {sorted(sd)[:3]}")


def _timm_to_effnet_keys(sd: Mapping[str, np.ndarray],
                         spec: EfficientNetSpec) -> Dict[str, np.ndarray]:
    """Rename a timm efficientnet_{variant} ImageNet state dict to the
    efficientnet_pytorch backbone naming (bare `_conv_stem.*` style)."""
    out: Dict[str, np.ndarray] = {"_conv_stem.weight": sd["conv_stem.weight"]}
    bnmap = ("weight", "bias", "running_mean", "running_var")
    for a in bnmap:
        out[f"_bn0.{a}"] = sd[f"bn1.{a}"]
    for i, ((s, j), b) in enumerate(zip(_stage_indices(spec), spec.blocks)):
        t = f"blocks.{s}.{j}"
        p = f"_blocks.{i}"
        if b.expand == 1:
            # timm DepthwiseSeparableConv: conv_dw/bn1, se, conv_pw/bn2
            out[f"{p}._depthwise_conv.weight"] = sd[f"{t}.conv_dw.weight"]
            for a in bnmap:
                out[f"{p}._bn1.{a}"] = sd[f"{t}.bn1.{a}"]
            out[f"{p}._project_conv.weight"] = sd[f"{t}.conv_pw.weight"]
            for a in bnmap:
                out[f"{p}._bn2.{a}"] = sd[f"{t}.bn2.{a}"]
        else:
            # timm InvertedResidual: conv_pw/bn1, conv_dw/bn2, se, conv_pwl/bn3
            out[f"{p}._expand_conv.weight"] = sd[f"{t}.conv_pw.weight"]
            for a in bnmap:
                out[f"{p}._bn0.{a}"] = sd[f"{t}.bn1.{a}"]
            out[f"{p}._depthwise_conv.weight"] = sd[f"{t}.conv_dw.weight"]
            for a in bnmap:
                out[f"{p}._bn1.{a}"] = sd[f"{t}.bn2.{a}"]
            out[f"{p}._project_conv.weight"] = sd[f"{t}.conv_pwl.weight"]
            for a in bnmap:
                out[f"{p}._bn2.{a}"] = sd[f"{t}.bn3.{a}"]
        out[f"{p}._se_reduce.weight"] = sd[f"{t}.se.conv_reduce.weight"]
        out[f"{p}._se_reduce.bias"] = sd[f"{t}.se.conv_reduce.bias"]
        out[f"{p}._se_expand.weight"] = sd[f"{t}.se.conv_expand.weight"]
        out[f"{p}._se_expand.bias"] = sd[f"{t}.se.conv_expand.bias"]
    out["_conv_head.weight"] = sd["conv_head.weight"]
    for a in bnmap:
        out[f"_bn1.{a}"] = sd[f"bn2.{a}"]
    return out


def convert_imagenet_state_dict(sd: Mapping[str, np.ndarray],
                                spec: EfficientNetSpec,
                                rng) -> Dict[str, Any]:
    """Bare ImageNet EfficientNet state dict -> our param tree with the
    pretrained backbone and a FRESHLY-initialized 1280->512->256->1 head.

    This is what the reference's model constructor does: it downloads the
    efficientnet_pytorch ImageNet weights (`EfficientNet.from_pretrained`,
    reference model.py:40-41) and replaces `_fc` with the custom head
    (model.py:48-61) — every training run, including --fresh
    (reference train.py:841), starts from this init.

    Accepts either the efficientnet_pytorch release schema
    (`_conv_stem.weight`, single-Linear `_fc.{weight,bias}`) or a timm
    `efficientnet_{variant}` state dict; the 1000-class ImageNet classifier
    is discarded in both cases.
    """
    schema = detect_state_dict_schema(sd)
    if schema == "reference":
        return convert_state_dict(sd, spec)
    if schema == "timm":
        sd = _timm_to_effnet_keys(sd, spec)
    sd_ref = {f"net.{k}": v for k, v in sd.items()
              if not k.startswith("_fc.") and not k.startswith("classifier.")}
    params = _convert_backbone(sd_ref, spec)
    params["fc"] = init_params(rng, spec)["fc"]
    return params


def load_imagenet_checkpoint(path: str, spec: EfficientNetSpec | None = None,
                             rng=None):
    """Load an ImageNet .pth (efficientnet_pytorch or timm naming) OR a
    wrapped checkpoint (reference train.py-style `{'model_state_dict': ...}`)
    into (backbone-pretrained, head-fresh) params. Deserialization goes
    through load_torch_state_dict (weights_only=True + the closed numpy
    allowlist), which unwraps checkpoint dicts and drops non-tensor
    metadata before conversion."""
    import jax
    spec = spec or EfficientNetSpec.make("b0")
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sd, _ = load_torch_state_dict(path)
    return convert_imagenet_state_dict(sd, spec, rng)


def load_checkpoint(path: str, spec: EfficientNetSpec | None = None):
    """Load the reference checkpoint into (params, metadata). Metadata carries
    'epoch', 'val_acc', 'config' when present (deepfake_detection.py:64-70)."""
    spec = spec or EfficientNetSpec.make("b0")
    sd, ckpt = load_torch_state_dict(path)
    params = convert_state_dict(sd, spec)
    meta = {k: ckpt[k] for k in ("epoch", "val_acc", "config") if k in ckpt}
    return params, meta


def export_state_dict(params, spec: EfficientNetSpec) -> Dict[str, np.ndarray]:
    """JAX param pytree -> torch-naming state dict (for interop checks and
    for users migrating checkpoints back)."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(key, w):
        sd[key] = np.transpose(np.asarray(w), (3, 2, 0, 1))

    def put_bn(prefix, bn):
        sd[f"{prefix}.weight"] = np.asarray(bn["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn["var"])

    def put_linear(prefix, lin):
        sd[f"{prefix}.weight"] = np.asarray(lin["w"]).T
        sd[f"{prefix}.bias"] = np.asarray(lin["b"])

    put_conv("net._conv_stem.weight", params["stem"]["conv"])
    put_bn("net._bn0", params["stem"]["bn"])
    for i, (blk, b) in enumerate(zip(params["blocks"], spec.blocks)):
        p = f"net._blocks.{i}"
        if b.expand != 1:
            put_conv(f"{p}._expand_conv.weight", blk["expand_conv"])
            put_bn(f"{p}._bn0", blk["bn0"])
        put_conv(f"{p}._depthwise_conv.weight", blk["depthwise"])
        put_bn(f"{p}._bn1", blk["bn1"])
        put_conv(f"{p}._se_reduce.weight", blk["se_reduce"]["w"])
        sd[f"{p}._se_reduce.bias"] = np.asarray(blk["se_reduce"]["b"])
        put_conv(f"{p}._se_expand.weight", blk["se_expand"]["w"])
        sd[f"{p}._se_expand.bias"] = np.asarray(blk["se_expand"]["b"])
        put_conv(f"{p}._project_conv.weight", blk["project"])
        put_bn(f"{p}._bn2", blk["bn2"])
    put_conv("net._conv_head.weight", params["head"]["conv"])
    put_bn("net._bn1", params["head"]["bn"])
    put_linear("net._fc.1", params["fc"]["fc1"])
    put_bn("net._fc.2", params["fc"]["bn1"])
    put_linear("net._fc.5", params["fc"]["fc2"])
    put_bn("net._fc.6", params["fc"]["bn2"])
    put_linear("net._fc.9", params["fc"]["fc3"])
    return sd


def load_transformers_backbone(sd: Mapping[str, np.ndarray],
                               spec: EfficientNetSpec | None = None):
    """Load a reference-naming (`net._*`) backbone state dict into
    transformers' torch EfficientNetModel — an independent TF-faithful torch
    implementation standing in for efficientnet_pytorch, which is not
    installed here. Used by parity tests and the weight drill as the trusted
    donor forward."""
    import torch
    from transformers import EfficientNetConfig
    from transformers.models.efficientnet.modeling_efficientnet import (
        EfficientNetModel,
    )

    spec = spec or EfficientNetSpec.make("b0")
    width, depth = {"b0": (1.0, 1.0)}.get(spec.variant, (None, None))
    if width is None:
        from ..models.efficientnet import _SCALING
        width, depth = _SCALING[spec.variant][:2]
    cfg = EfficientNetConfig(
        width_coefficient=width, depth_coefficient=depth,
        image_size=spec.resolution, hidden_dim=spec.head_filters,
        pooling_type="mean", hidden_act="swish")
    tm = EfficientNetModel(cfg).eval()

    mapping = {"embeddings.convolution.weight": "net._conv_stem.weight"}
    for a in ("weight", "bias", "running_mean", "running_var"):
        mapping[f"embeddings.batchnorm.{a}"] = f"net._bn0.{a}"
    for i, blk in enumerate(spec.blocks):
        p, q = f"encoder.blocks.{i}", f"net._blocks.{i}"
        if blk.expand != 1:
            mapping[f"{p}.expansion.expand_conv.weight"] = f"{q}._expand_conv.weight"
            for a in ("weight", "bias", "running_mean", "running_var"):
                mapping[f"{p}.expansion.expand_bn.{a}"] = f"{q}._bn0.{a}"
        mapping[f"{p}.depthwise_conv.depthwise_conv.weight"] = \
            f"{q}._depthwise_conv.weight"
        for a in ("weight", "bias", "running_mean", "running_var"):
            mapping[f"{p}.depthwise_conv.depthwise_norm.{a}"] = f"{q}._bn1.{a}"
        mapping[f"{p}.squeeze_excite.reduce.weight"] = f"{q}._se_reduce.weight"
        mapping[f"{p}.squeeze_excite.reduce.bias"] = f"{q}._se_reduce.bias"
        mapping[f"{p}.squeeze_excite.expand.weight"] = f"{q}._se_expand.weight"
        mapping[f"{p}.squeeze_excite.expand.bias"] = f"{q}._se_expand.bias"
        mapping[f"{p}.projection.project_conv.weight"] = f"{q}._project_conv.weight"
        for a in ("weight", "bias", "running_mean", "running_var"):
            mapping[f"{p}.projection.project_bn.{a}"] = f"{q}._bn2.{a}"
    mapping["encoder.top_conv.weight"] = "net._conv_head.weight"
    for a in ("weight", "bias", "running_mean", "running_var"):
        mapping[f"encoder.top_bn.{a}"] = f"net._bn1.{a}"

    new_sd = {}
    for tk, v in tm.state_dict().items():
        if tk.endswith("num_batches_tracked"):
            new_sd[tk] = v
            continue
        new_sd[tk] = torch.from_numpy(np.ascontiguousarray(sd[mapping[tk]]))
    tm.load_state_dict(new_sd)
    return tm


def build_torch_reference_predictor(sd: Mapping[str, np.ndarray],
                                    spec: EfficientNetSpec | None = None):
    """Build the reference's torch inference path from a reference-naming
    state dict: transformers' EfficientNet (see load_transformers_backbone)
    + the custom 1280->512->256->1 head (model.py:48-61),
    with the reference's preprocessing (deepfake_detection.py:382-398:
    bilinear resize 224, /255, ImageNet normalize, sigmoid).

    Returns predict(aligned_rgb_160: (160,160,3) f32 raw 0-255) -> float.
    Used by the end-to-end weight drill to check checkpoint->server->JSON
    probabilities against the torch-computed path.
    """
    import torch

    spec = spec or EfficientNetSpec.make("b0")
    tm = load_transformers_backbone(sd, spec)

    def lin(prefix):
        m = torch.nn.Linear(sd[f"{prefix}.weight"].shape[1],
                            sd[f"{prefix}.weight"].shape[0])
        m.weight.data = torch.from_numpy(np.ascontiguousarray(sd[f"{prefix}.weight"]))
        m.bias.data = torch.from_numpy(np.ascontiguousarray(sd[f"{prefix}.bias"]))
        return m

    def bn1d(prefix):
        n = sd[f"{prefix}.weight"].shape[0]
        m = torch.nn.BatchNorm1d(n)
        m.weight.data = torch.from_numpy(np.ascontiguousarray(sd[f"{prefix}.weight"]))
        m.bias.data = torch.from_numpy(np.ascontiguousarray(sd[f"{prefix}.bias"]))
        m.running_mean.data = torch.from_numpy(
            np.ascontiguousarray(sd[f"{prefix}.running_mean"]))
        m.running_var.data = torch.from_numpy(
            np.ascontiguousarray(sd[f"{prefix}.running_var"]))
        return m

    head = torch.nn.Sequential(
        lin("net._fc.1"), bn1d("net._fc.2"), torch.nn.ReLU(),
        lin("net._fc.5"), bn1d("net._fc.6"), torch.nn.ReLU(),
        lin("net._fc.9")).eval()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def predict(aligned_rgb_160: np.ndarray) -> float:
        x = torch.from_numpy(np.ascontiguousarray(aligned_rgb_160))
        x = x.permute(2, 0, 1).unsqueeze(0)
        x = torch.nn.functional.interpolate(
            x, (224, 224), mode="bilinear", align_corners=False)
        x = (x / 255.0 - mean) / std
        with torch.no_grad():
            feats = tm(x).pooler_output
            logit = head(feats)
        return float(torch.sigmoid(logit[0, 0]))

    return predict


def make_imagenet_shaped_state_dict(spec: EfficientNetSpec, seed: int = 0,
                                    schema: str = "effnet_pytorch"):
    """Synthesize a random ImageNet-release-shaped state dict (no real
    download available in this environment) with the exact key/shape schema
    of efficientnet_pytorch's `efficientnet-{variant}-*.pth` or a timm
    `efficientnet_{variant}` checkpoint — used to test the --pretrained
    conversion path."""
    import jax
    rs = np.random.RandomState(seed)
    params = init_params(jax.random.PRNGKey(seed), spec)
    full = export_state_dict(params, spec)
    bare = {k[len("net."):]: v for k, v in full.items()
            if not k.startswith("net._fc.")}
    n_cls = 1000
    if schema == "effnet_pytorch":
        bare["_fc.weight"] = rs.randn(n_cls, spec.head_filters).astype(np.float32)
        bare["_fc.bias"] = rs.randn(n_cls).astype(np.float32)
        return bare
    if schema != "timm":
        raise ValueError(f"unknown schema {schema!r}")
    # invert _timm_to_effnet_keys via a probe whose values are the timm names
    probe = {k: k for k in _timm_shaped_keys(spec)}
    inv = _timm_to_effnet_keys(probe, spec)  # effnet key -> timm key
    out = {inv[k]: v for k, v in bare.items() if k in inv}
    out["classifier.weight"] = rs.randn(n_cls, spec.head_filters).astype(np.float32)
    out["classifier.bias"] = rs.randn(n_cls).astype(np.float32)
    return out


def _timm_shaped_keys(spec: EfficientNetSpec):
    """All timm state-dict key names for this variant (values unused)."""
    bnmap = ("weight", "bias", "running_mean", "running_var")
    yield "conv_stem.weight"
    for a in bnmap:
        yield f"bn1.{a}"
    for (s, j), b in zip(_stage_indices(spec), spec.blocks):
        t = f"blocks.{s}.{j}"
        if b.expand == 1:
            yield f"{t}.conv_dw.weight"
            for a in bnmap:
                yield f"{t}.bn1.{a}"
            yield f"{t}.conv_pw.weight"
            for a in bnmap:
                yield f"{t}.bn2.{a}"
        else:
            yield f"{t}.conv_pw.weight"
            for a in bnmap:
                yield f"{t}.bn1.{a}"
            yield f"{t}.conv_dw.weight"
            for a in bnmap:
                yield f"{t}.bn2.{a}"
            yield f"{t}.conv_pwl.weight"
            for a in bnmap:
                yield f"{t}.bn3.{a}"
        yield f"{t}.se.conv_reduce.weight"
        yield f"{t}.se.conv_reduce.bias"
        yield f"{t}.se.conv_expand.weight"
        yield f"{t}.se.conv_expand.bias"
    yield "conv_head.weight"
    for a in bnmap:
        yield f"bn2.{a}"


def make_reference_shaped_state_dict(spec: EfficientNetSpec, seed: int = 0):
    """Synthesize a random torch-naming state dict with the exact key/shape
    schema of the reference checkpoint — used to test the converter when the
    real best_model.pth artifact is absent (it is .MISSING_LARGE_BLOBS in the
    reference snapshot)."""
    import jax
    params = init_params(jax.random.PRNGKey(seed), spec)
    return export_state_dict(params, spec)
