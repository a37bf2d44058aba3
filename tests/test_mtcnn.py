"""MTCNN architecture/flow tests (CPU, random weights — the real facenet
weights are not distributable in this environment; shape and flow contracts
are what can be locked down)."""

import numpy as np
import pytest
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.models import mtcnn as M

rng = np.random.default_rng(31)


@pytest.fixture(scope="module")
def params():
    return M.init_random_mtcnn(0)


def test_pnet_fully_convolutional(params):
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 3)).astype(np.float32))
    probs, reg = M.pnet_forward(params["pnet"], x)
    assert probs.shape == (1, 1, 1, 2)
    assert reg.shape == (1, 1, 1, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)
    x2 = jnp.asarray(rng.standard_normal((1, 48, 36, 3)).astype(np.float32))
    probs2, _ = M.pnet_forward(params["pnet"], x2)
    assert probs2.shape == (1, 19, 13, 2)   # (n-2)/2ceil chain


def test_rnet_onet_shapes(params):
    xr = jnp.asarray(rng.standard_normal((5, 24, 24, 3)).astype(np.float32))
    probs, reg = M.rnet_forward(params["rnet"], xr)
    assert probs.shape == (5, 2) and reg.shape == (5, 4)
    xo = jnp.asarray(rng.standard_normal((5, 48, 48, 3)).astype(np.float32))
    probs, reg, pts = M.onet_forward(params["onet"], xo)
    assert probs.shape == (5, 2) and reg.shape == (5, 4) and pts.shape == (5, 10)


def test_converter_matches_facenet_key_schema(params):
    """Synthesize a torch-naming state dict and convert; shapes must match
    the random-init tree exactly."""
    import jax
    sd = {}
    # pnet torch naming
    shapes = {
        "conv1": (10, 3, 3, 3), "conv2": (16, 10, 3, 3), "conv3": (32, 16, 3, 3),
        "conv4_1": (2, 32, 1, 1), "conv4_2": (4, 32, 1, 1)}
    for k, s in shapes.items():
        sd[f"{k}.weight"] = rng.standard_normal(s).astype(np.float32)
        sd[f"{k}.bias"] = rng.standard_normal((s[0],)).astype(np.float32)
    for i, c in [(1, 10), (2, 16), (3, 32)]:
        sd[f"prelu{i}.weight"] = rng.standard_normal((c,)).astype(np.float32)
    conv = M.convert_facenet_state_dict(sd, "pnet")
    ref = params["pnet"]
    assert jax.tree.structure(conv) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(conv), jax.tree.leaves(ref)):
        assert a.shape == b.shape


def test_nms_mask_basic():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                         [0, 0, 0, 0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.0])
    valid = jnp.asarray([True, True, True, False])
    keep = M._nms_mask(boxes, scores, valid, 0.5)
    assert list(np.asarray(keep)) == [True, False, True, False]


def test_crop_resize_identity():
    img = jnp.asarray(rng.random((64, 64, 3), dtype=np.float32))
    out = M._crop_resize_bilinear(img, jnp.asarray([0.0, 0.0, 64.0, 64.0]), 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


@pytest.mark.slow
def test_aligner_flow(params):
    """End-to-end cascade flow with permissive thresholds: must return a
    160x160x3 raw-range RGB array."""
    al = M.MTCNNAligner(params, thresholds=(-1.0, -1.0, -1.0))
    face = rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)
    out = al(face)
    assert out is not None
    assert out.shape == (160, 160, 3)
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 255.0


@pytest.mark.slow
def test_aligner_none_when_no_face(params):
    al = M.MTCNNAligner(params, thresholds=(1.1, 1.1, 1.1))  # impossible
    face = rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)
    assert al(face) is None


def test_aligner_tiny_input(params):
    al = M.MTCNNAligner(params)
    assert al(np.zeros((8, 8, 3), np.uint8)) is None


def test_from_weights_never_unpickles(tmp_path):
    """Serving-bootstrap hardening (--mtcnn-weights path): from_weights
    loads plain tensor state dicts with torch weights_only=True — both the
    per-net directory layout and the single-file bundle — and REFUSES a
    file whose deserialization needs a full unpickle (arbitrary-code-
    execution surface for a downloaded artifact)."""
    import argparse

    import torch

    from tests.test_mtcnn_parity import make_torch_state_dicts

    sds = make_torch_state_dicts(0)
    d = tmp_path / "mtcnn"
    d.mkdir()
    for net, sd in sds.items():
        torch.save(sd, d / f"{net}.pt")
    al = M.MTCNNAligner.from_weights(str(d))
    assert set(al.params) == {"pnet", "rnet", "onet"}

    bundle = {f"{net}.{k}": v for net, sd in sds.items()
              for k, v in sd.items()}
    bpath = tmp_path / "bundle.pt"
    torch.save(bundle, bpath)
    al2 = M.MTCNNAligner.from_weights(str(bpath))
    assert set(al2.params) == {"pnet", "rnet", "onet"}
    np.testing.assert_array_equal(
        np.asarray(al.params["pnet"]["conv1"]["w"]),
        np.asarray(al2.params["pnet"]["conv1"]["w"]))

    evil = tmp_path / "evil.pt"
    torch.save({"pnet.conv1.weight": argparse.Namespace(boom=1)}, evil)
    with pytest.raises(Exception):
        M.MTCNNAligner.from_weights(str(evil))
