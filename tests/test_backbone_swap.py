"""Config-5 tests: ViT backbone, tensor-parallel sharding on a 2D mesh,
temporal attention head + streaming clip state, B4 spec."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.models import vit, temporal_head as th
from real_time_video_deepfake_detection_tpu.models.efficientnet import (
    EfficientNetSpec,
)

rng = np.random.default_rng(71)


def test_vit_forward_shapes():
    spec = vit.ViTSpec.make("s16", image_size=96)
    params = vit.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((2, 96, 96, 3)).astype(np.float32))
    logits = jax.jit(lambda p, x: vit.forward(p, x, spec))(params, x)
    assert logits.shape == (2, 1)
    feats = vit.extract_features(params, x, spec)
    assert feats.shape == (2, spec.dim)


def test_vit_tensor_parallel_2d_mesh():
    """4x2 (data x model) mesh: qkv heads and MLP hidden sharded over the
    model axis; forward must produce identical logits to the replicated run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    spec = vit.ViTSpec.make("s16", image_size=64)
    params = vit.init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 3)).astype(np.float32))

    ref = vit.forward(params, x, spec)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    pspecs = vit.vit_partition_specs(params)
    sharded_params = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, pspecs,
        is_leaf=lambda v: isinstance(v, jnp.ndarray))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    f = jax.jit(lambda p, x: vit.forward(p, x, spec),
                out_shardings=NamedSharding(mesh, P("data")))
    out = f(sharded_params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_b4_spec():
    spec = EfficientNetSpec.make("b4")
    assert len(spec.blocks) == 32
    assert spec.head_filters == 1792
    assert spec.resolution == 380


def test_temporal_head_mask_invariance():
    """Padded frames must not affect the logit: a 10-frame clip inside a
    64-window with mask == the same clip densely packed."""
    spec = th.TemporalHeadSpec(feature_dim=32, dim=64, depth=2, heads=4, window=64)
    params = th.init_params(jax.random.PRNGKey(0), spec)
    f10 = rng.standard_normal((1, 10, 32)).astype(np.float32)

    dense = th.forward(params, jnp.asarray(f10),
                       jnp.ones((1, 10), bool),
                       th.TemporalHeadSpec(32, 64, 2, 4, 10))
    padded_feats = np.zeros((1, 64, 32), np.float32)
    padded_feats[:, :10] = f10
    mask = np.zeros((1, 64), bool)
    mask[:, :10] = True
    padded = th.forward(params, jnp.asarray(padded_feats), jnp.asarray(mask), spec)
    np.testing.assert_allclose(float(dense[0]), float(padded[0]), atol=1e-4)


@pytest.mark.slow
def test_clip_state_streaming_matches_dense():
    spec = th.TemporalHeadSpec(feature_dim=16, dim=32, depth=1, heads=2, window=8)
    params = th.init_params(jax.random.PRNGKey(1), spec)
    feats = rng.standard_normal((12, 16)).astype(np.float32)

    state = th.clip_state_init(spec)
    for t in range(12):
        state = th.clip_state_push(state, jnp.asarray(feats[t]))
    streaming = float(th.clip_verdict(params, state, spec))

    last8 = feats[-8:]
    dense = float(jax.nn.sigmoid(th.forward(
        params, jnp.asarray(last8)[None], jnp.ones((1, 8), bool), spec))[0])
    assert streaming == pytest.approx(dense, abs=1e-5)


def test_blockwise_runs():
    spec = th.TemporalHeadSpec(feature_dim=16, dim=32, depth=1, heads=2, window=64)
    params = th.init_params(jax.random.PRNGKey(2), spec)
    feats = jnp.asarray(rng.standard_normal((2, 300, 16)).astype(np.float32))
    mask = jnp.ones((2, 300), bool)
    out = th.forward_blockwise(params, feats, mask, spec, block=128)
    assert out.shape == (2,)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_xception_backbone():
    """Xception (BASELINE config 5's 'ViT/Xception' alternative; the
    FaceForensics++ deepfake baseline): trainable backbone parameter count
    matches the published keras include_top=False model exactly
    (20,806,952), forward/gradient finite, GAP features 2048-d."""
    from real_time_video_deepfake_detection_tpu.models import xception as X

    p = X.init_params(jax.random.PRNGKey(0))
    head = 2048 + 1
    assert X.n_trainable_params(p) - head == 20_806_952

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 96, 96, 3)), jnp.float32)
    out = jax.jit(X.forward)(p, x)
    assert out.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())
    feats = X.extract_features(p, x)
    assert feats.shape == (2, 2048)
    g = jax.grad(lambda q: jnp.sum(X.forward(q, x)))(p)
    assert bool(jnp.isfinite(g["conv1"]["w"]).all())
