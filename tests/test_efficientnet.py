"""EfficientNet-B0 architecture + converter tests.

Parity strategy: the reference checkpoint artifact (best_model.pth) is absent
from the snapshot (.MISSING_LARGE_BLOBS), so numerical parity is established
against an independent trusted torch implementation of the same TF
architecture (transformers.EfficientNetModel) loaded with OUR exported
weights — this validates conv/SAME-padding/SE/BN semantics end to end.
Converter round-trip and the checkpoint key schema are tested against a
synthesized reference-shaped state dict (reference model.py:48-61 naming).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.models.efficientnet import (
    EfficientNetSpec, init_params, param_count, forward, extract_features,
    forward_train,
)
from real_time_video_deepfake_detection_tpu.utils.torch_convert import (
    convert_state_dict, export_state_dict, make_reference_shaped_state_dict,
)

SPEC = EfficientNetSpec.make("b0")


def transformers_b0_key_mapping(spec):
    """transformers EfficientNetModel key -> reference-style key (net._*).
    Shared with tests/test_torch_trajectory.py, which rebuilds the reference
    training recipe around the same donor torch backbone."""
    mapping = {}
    mapping["embeddings.convolution.weight"] = "net._conv_stem.weight"
    for a, b in [("weight", "weight"), ("bias", "bias"),
                 ("running_mean", "running_mean"), ("running_var", "running_var")]:
        mapping[f"embeddings.batchnorm.{a}"] = f"net._bn0.{b}"
    for i, blk in enumerate(spec.blocks):
        p, q = f"encoder.blocks.{i}", f"net._blocks.{i}"
        if blk.expand != 1:
            mapping[f"{p}.expansion.expand_conv.weight"] = f"{q}._expand_conv.weight"
            for a in ["weight", "bias", "running_mean", "running_var"]:
                mapping[f"{p}.expansion.expand_bn.{a}"] = f"{q}._bn0.{a}"
        mapping[f"{p}.depthwise_conv.depthwise_conv.weight"] = f"{q}._depthwise_conv.weight"
        for a in ["weight", "bias", "running_mean", "running_var"]:
            mapping[f"{p}.depthwise_conv.depthwise_norm.{a}"] = f"{q}._bn1.{a}"
        mapping[f"{p}.squeeze_excite.reduce.weight"] = f"{q}._se_reduce.weight"
        mapping[f"{p}.squeeze_excite.reduce.bias"] = f"{q}._se_reduce.bias"
        mapping[f"{p}.squeeze_excite.expand.weight"] = f"{q}._se_expand.weight"
        mapping[f"{p}.squeeze_excite.expand.bias"] = f"{q}._se_expand.bias"
        mapping[f"{p}.projection.project_conv.weight"] = f"{q}._project_conv.weight"
        for a in ["weight", "bias", "running_mean", "running_var"]:
            mapping[f"{p}.projection.project_bn.{a}"] = f"{q}._bn2.{a}"
    mapping["encoder.top_conv.weight"] = "net._conv_head.weight"
    for a in ["weight", "bias", "running_mean", "running_var"]:
        mapping[f"encoder.top_bn.{a}"] = f"net._bn1.{a}"
    return mapping


def test_architecture_shape():
    assert len(SPEC.blocks) == 16              # reference train.py:863-876
    assert SPEC.stem_filters == 32
    assert SPEC.head_filters == 1280


def test_param_count():
    params = init_params(jax.random.PRNGKey(0), SPEC)
    total = param_count(params)
    # torch's model.parameters() excludes BN running stats; the reference
    # asserts < 8M (tests/test_performance.py:234-241). Backbone 4,007,548 +
    # custom head 788,993 = 4,796,541 torch-countable params.
    stats = sum(
        int(np.prod(v.shape))
        for path, v in jax.tree_util.tree_leaves_with_path(params)
        if any(getattr(p, "key", None) in ("mean", "var") for p in path))
    assert total - stats == 4_796_541
    assert total - stats < 8_000_000


def test_forward_shapes_and_determinism():
    params = init_params(jax.random.PRNGKey(0), SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    f = jax.jit(lambda p, x: forward(p, x, SPEC))
    l1, l2 = f(params, x), f(params, x)
    assert l1.shape == (2, 1)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_converter_roundtrip():
    sd = make_reference_shaped_state_dict(SPEC, seed=3)
    params = convert_state_dict(sd, SPEC)
    sd2 = export_state_dict(params, SPEC)
    assert set(sd.keys()) == set(sd2.keys())
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k])


def test_checkpoint_key_schema_matches_reference():
    """Keys must exactly match the reference torch module naming
    (net._conv_stem / net._blocks.N.* / net._fc.{1,2,5,6,9} —
    model.py:48-61, train.py:863-876)."""
    sd = make_reference_shaped_state_dict(SPEC, seed=0)
    assert "net._conv_stem.weight" in sd
    assert "net._blocks.0._depthwise_conv.weight" in sd
    assert "net._blocks.15._project_conv.weight" in sd
    assert "net._blocks.0._expand_conv.weight" not in sd   # block 0: expand==1
    assert "net._blocks.1._expand_conv.weight" in sd
    assert sd["net._fc.1.weight"].shape == (512, 1280)
    assert sd["net._fc.5.weight"].shape == (256, 512)
    assert sd["net._fc.9.weight"].shape == (1, 256)
    assert "net._fc.2.running_mean" in sd


@pytest.mark.slow
def test_train_forward_runs():
    params = init_params(jax.random.PRNGKey(0), SPEC)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
    logits, stats = forward_train(params, x, SPEC, jax.random.PRNGKey(2))
    assert logits.shape == (2, 1)
    assert len(stats) > 16  # one entry per BN application


@pytest.mark.slow
def test_backbone_parity_vs_transformers_torch():
    """Load OUR random weights into transformers' torch EfficientNet (an
    independent TF-faithful implementation) and require matching pooled
    features — validates SAME padding, SE, BN eps, swish end to end."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import EfficientNetConfig
        from transformers.models.efficientnet.modeling_efficientnet import (
            EfficientNetModel,
        )
    except Exception:
        pytest.skip("transformers EfficientNet unavailable")

    cfg = EfficientNetConfig(
        width_coefficient=1.0, depth_coefficient=1.0, image_size=224,
        hidden_dim=1280, pooling_type="mean", hidden_act="swish")
    tm = EfficientNetModel(cfg).eval()

    params = init_params(jax.random.PRNGKey(5), SPEC)
    # Give BN stats non-trivial values so the check exercises them.
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.05 if getattr(p[-1], "key", None) == "var" else v, params)
    sd_ref = export_state_dict(params, SPEC)

    # reference-style naming -> transformers naming
    tsd = tm.state_dict()
    mapping = transformers_b0_key_mapping(SPEC)

    new_sd = {}
    for tk, v in tsd.items():
        if tk.endswith("num_batches_tracked"):
            new_sd[tk] = v
            continue
        assert tk in mapping, f"unmapped transformers key {tk}"
        new_sd[tk] = torch.from_numpy(np.ascontiguousarray(sd_ref[mapping[tk]]))
    tm.load_state_dict(new_sd)

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 224, 224, 3), dtype=np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    torch_feats = out.pooler_output.numpy()

    jax_feats = np.asarray(extract_features(params, jnp.asarray(x), SPEC))
    np.testing.assert_allclose(jax_feats, torch_feats, atol=2e-4, rtol=2e-4)
