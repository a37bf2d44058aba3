"""Network-gated REAL-artifact validation tier (round-4 verdict item #4).

Everything else in the suite proves the loaders/compilers on synthesized
weights with exact release schemas; this tier closes the loop on the real
public files when a network exists:

  RUN_NETWORK_TESTS=1 python -m pytest tests/test_real_artifacts.py -q

It fetches via `rtvdd-fetch-weights` (pin + structural verification), then
asserts (a) the Caffe-protobuf->JAX SSD compiler reproduces cv2.dnn's boxes
on the real res10 caffemodel under the reference's selection semantics
(face_detection.py:71-105), (b) the JAX MTCNN cascade matches the
506-line facenet-faithful torch oracle running the real pnet/rnet/onet
weights, (c) the converted real ImageNet B0 matches the transformers torch
forward, and (d) a device-detect engine serves a verdict end-to-end with
everything real.

Zero-egress environments (like the build harness) skip cleanly at the
fetch fixture; the tier is part of the operator's acceptance checklist
(README deployment section).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_NETWORK_TESTS") != "1",
    reason="real-artifact tier needs network; set RUN_NETWORK_TESTS=1")


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    """Fetch (or reuse RTVDD_WEIGHTS_DIR) the real public artifacts."""
    from real_time_video_deepfake_detection_tpu.cli.fetch_weights import fetch

    dest = os.environ.get("RTVDD_WEIGHTS_DIR")
    dest = dest or str(tmp_path_factory.mktemp("real_weights"))
    failures = fetch(["ssd", "mtcnn", "effnet_b0_imagenet"], dest)
    if failures:
        pytest.skip(f"{failures} artifact fetch(es) failed — no network?")
    return dest


def _frames(n=6, h=480, w=640):
    """Mixed bag: random noise + synthetic face-ish frames the real SSD
    actually fires on."""
    from tests.test_mtcnn_parity import make_test_image

    rng = np.random.default_rng(0)
    out = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
           for _ in range(n // 2)]
    for s in range(n - len(out)):
        import cv2
        face = make_test_image(h=h // 2, w=w // 2, seed=s)
        canvas = np.full((h, w, 3), 60, np.uint8)
        y, x = h // 4, w // 4
        canvas[y:y + h // 2, x:x + w // 2] = face
        out.append(canvas)
    return out


def test_real_ssd_boxes_match_cv2_dnn(weights_dir):
    """(a) Our Caffe compiler + DetectionOutput/NMS vs cv2.dnn on the REAL
    res10 fp16 caffemodel, with the reference's box selection applied to
    both outputs (face_detection.py:71-105: conf > 0.5, int(r*dim), clamp,
    >20 px)."""
    import cv2

    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10,
    )

    proto = os.path.join(weights_dir, "deploy.prototxt")
    cm = os.path.join(weights_dir,
                      "res10_300x300_ssd_iter_140000_fp16.caffemodel")
    ours = SSDRes10.from_caffemodel(cm, proto)
    ref_net = cv2.dnn.readNetFromCaffe(proto, cm)

    n_detect = 0
    for frame in _frames():
        h, w = frame.shape[:2]
        blob = cv2.dnn.blobFromImage(cv2.resize(frame, (300, 300)), 1.0,
                                     (300, 300), (104.0, 177.0, 123.0))
        ref_net.setInput(blob)
        det = ref_net.forward()
        ref_boxes = []
        for row in det[0, 0]:
            conf = float(row[2])
            if conf > 0.5:
                x1, y1 = int(row[3] * w), int(row[4] * h)
                x2, y2 = int(row[5] * w), int(row[6] * h)
                x1, y1 = max(0, x1), max(0, y1)
                x2, y2 = min(w, x2), min(h, y2)
                if x2 - x1 > 20 and y2 - y1 > 20:
                    ref_boxes.append((x1, y1, x2 - x1, y2 - y1))
        got = ours.detect(frame, 0.5, 20)
        # cv2.resize vs our cv2-parity resize can flip confidences at the
        # 0.5 boundary; compare box geometry within 2 px for shared
        # detections and require identical counts
        assert len(got) == len(ref_boxes), (got, ref_boxes)
        for g, r in zip(sorted(got), sorted(ref_boxes)):
            assert all(abs(a - b) <= 2 for a, b in zip(g, r)), (g, r)
        n_detect += len(ref_boxes)
    assert n_detect > 0, "no frame triggered the real SSD — test is vacuous"


def test_real_mtcnn_matches_facenet_oracle(weights_dir):
    """(b) The static-pyramid JAX cascade vs the facenet-faithful torch
    oracle (tests/test_mtcnn_parity.py) — both running the REAL
    pnet/rnet/onet weights at the published thresholds."""
    import torch

    from tests import test_mtcnn_parity as P

    sds = {net: torch.load(os.path.join(weights_dir, "mtcnn", f"{net}.pt"),
                           map_location="cpu", weights_only=True)
           for net in ("pnet", "rnet", "onet")}
    th = (0.6, 0.7, 0.7)   # facenet-pytorch defaults
    img = P.make_test_image(h=160, w=160, seed=3)

    oracle_boxes = P.oracle_detect(img, sds, th)
    al = P.jax_aligner(sds, th)
    face, score, box = al.detect(img[..., ::-1].copy())

    if len(oracle_boxes) == 0:
        assert face is None
        pytest.skip("real MTCNN found no face on the synthetic image — "
                    "box parity not exercised; use a photo via "
                    "RTVDD_TEST_IMAGE for full coverage")
    assert face is not None
    best = oracle_boxes[0]
    np.testing.assert_allclose(box, best[:4], atol=1e-3)
    assert score == pytest.approx(float(best[4]), abs=1e-4)
    ref_face = P.oracle_extract_face(img, best[:4])
    assert np.abs(face - ref_face).max() <= 1.0 + 1e-3


def test_real_imagenet_b0_parity(weights_dir):
    """(c) The REAL efficientnet-b0 ImageNet release file through
    convert_imagenet_state_dict vs transformers' torch forward."""
    import torch

    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, extract_features,
    )
    from real_time_video_deepfake_detection_tpu.utils import (
        torch_convert as tc,
    )
    import jax

    path = os.path.join(weights_dir, "efficientnet-b0-355c32eb.pth")
    sd = {k: v.numpy() for k, v in
          torch.load(path, map_location="cpu", weights_only=True).items()}
    spec = EfficientNetSpec.make("b0")
    params = tc.convert_imagenet_state_dict(sd, spec, jax.random.PRNGKey(0))
    tm = tc.load_transformers_backbone(
        {f"net.{k}": v for k, v in sd.items() if not k.startswith("_fc.")},
        spec)
    x = np.random.RandomState(0).rand(2, 224, 224, 3).astype(np.float32)
    ours = np.asarray(extract_features(params, x, spec))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).pooler_output.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-4)


def test_real_weights_device_detect_e2e(weights_dir):
    """(d) Full engine: real SSD in the tick (device-detect), real MTCNN
    aligner weights, /analyze-shaped dict out."""
    import torch

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.models import mtcnn as M
    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine,
    )

    ssd = SSDRes10.from_caffemodel(
        os.path.join(weights_dir,
                     "res10_300x300_ssd_iter_140000_fp16.caffemodel"),
        os.path.join(weights_dir, "deploy.prototxt"))
    mt = {net: M.convert_facenet_state_dict(
        {k: v.numpy() for k, v in torch.load(
            os.path.join(weights_dir, "mtcnn", f"{net}.pt"),
            map_location="cpu", weights_only=True).items()}, net)
        for net in ("pnet", "rnet", "onet")}
    aligner = M.MTCNNAligner(mt)   # the reference's host aligner role

    eng = MultiStreamEngine(
        DetectorConfig().with_threshold(0.55),
        ServerConfig(max_streams=4, max_batch=4, batch_timeout_ms=2.0,
                     min_request_interval=0.0, device_detect=True),
        ssd_net=ssd.net, aligner=aligner)
    try:
        r = None
        for f in _frames(4):
            r = eng.analyze(f, "real")
        assert r is not None
        for key in ("is_deepfake", "fake_probability", "confidence_level",
                    "frame_count"):
            assert key in r
    finally:
        eng.shutdown()
