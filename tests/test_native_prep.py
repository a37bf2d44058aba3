"""Parity tests for the native (C++) per-request prep path
(native/ingest.cpp: ingest_prep_frame and its pieces) against the Python
reference implementations.

Exactness contracts:
  - heuristic face detector: EXACT (same float32 mask arithmetic, same
    numpy-'linear' percentile)
  - CLAHE: EXACT (port of ops/clahe.py clahe_u8_numpy, which is bit-exact
    vs cv2 for tile-divisible sizes)
  - LAB u8 conversions: within +-2 LSB of cv2's fixed-point tables (the
    float formula; documented deviation)
  - end to end: served probability of the native path within 5e-3 of the
    Python path, same votes
"""

import numpy as np
import pytest

from real_time_video_deepfake_detection_tpu.models.heuristic_face import (
    detect_heuristic,
)
from real_time_video_deepfake_detection_tpu.ops.clahe import clahe_u8_numpy
from real_time_video_deepfake_detection_tpu.utils import native_ingest as ni

if ni.get_lib() is None:
    pytest.skip("native ingest library unavailable", allow_module_level=True)


def _skin_frame(h=240, w=320, seed=0):
    g = np.random.default_rng(seed)
    img = np.stack([np.full((h, w), 120.0), np.full((h, w), 140.0),
                    np.full((h, w), 180.0)], -1)
    img += g.normal(0, 15, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_detector_exact_vs_python():
    for seed in range(20):
        g = np.random.default_rng(seed)
        if seed % 2 == 0:
            img = _skin_frame(seed=seed)
        else:
            img = g.integers(0, 256, (240, 320, 3), np.uint8)
        assert ni.detect_heuristic_native(img) == detect_heuristic(img), seed


def test_clahe_exact_vs_python():
    for seed in range(12):
        g = np.random.default_rng(seed)
        h, w = int(g.integers(60, 300)), int(g.integers(60, 300))
        src = g.integers(0, 256, (h, w), np.uint8)
        np.testing.assert_array_equal(
            ni.clahe_u8_native(src), clahe_u8_numpy(src), err_msg=f"{(h, w)}")


def test_lab_within_2lsb_of_cv2():
    import cv2
    g = np.random.default_rng(3)
    img = g.integers(0, 256, (128, 128, 3), np.uint8)
    lab_cv = cv2.cvtColor(img, cv2.COLOR_BGR2LAB).astype(int)
    assert np.abs(lab_cv - ni.bgr2lab_native(img).astype(int)).max() <= 2
    back_cv = cv2.cvtColor(lab_cv.astype(np.uint8), cv2.COLOR_LAB2BGR).astype(int)
    back_nat = ni.lab2bgr_native(lab_cv.astype(np.uint8)).astype(int)
    assert np.abs(back_cv - back_nat).max() <= 2


def test_prep_frame_pieces_match_python_path():
    """frame256 and box must be EXACT vs the Python chain; the aligned crop
    within the LAB deviation envelope."""
    import cv2
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        _ResizeAligner, preprocess_face_quality,
    )
    from real_time_video_deepfake_detection_tpu.utils.host_resize import (
        resize_analysis,
    )

    frame = _skin_frame(seed=7)
    ok, enc = cv2.imencode(".jpg", frame)
    data = enc.tobytes()

    r = ni.prep_frame(data)
    assert r is not None
    frame256_n, aligned_n, box_n = r

    decoded = ni.decode_jpeg(data)
    np.testing.assert_array_equal(frame256_n, resize_analysis(decoded, 256, 256))
    boxes = detect_heuristic(decoded)
    assert boxes and box_n == boxes[0]
    x, y, w, h = boxes[0]
    crop = decoded[y:y + h, x:x + w]
    aligned_py = _ResizeAligner()(preprocess_face_quality(crop))
    # LAB float-vs-fixed-point (+-2 LSB) is the only divergence; after CLAHE
    # and resize it stays a few grey levels.
    assert np.abs(aligned_n.astype(np.float32) - aligned_py).max() <= 6.0
    assert np.abs(aligned_n.astype(np.float32) - aligned_py).mean() <= 1.0


@pytest.mark.slow
def test_served_probability_guard():
    """engine.analyze_jpeg (native prep) vs engine.analyze (Python prep):
    probability within 5e-3, identical votes."""
    import cv2
    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine,
    )

    import dataclasses
    engine = MultiStreamEngine(
        # native prep reproduces the heuristic rung; pin it so the fast
        # path is eligible regardless of whether a haar XML is installed
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        ServerConfig(max_streams=4, max_batch=4, batch_timeout_ms=2.0,
                     min_request_interval=0.0))
    try:
        for seed in (7, 8, 9):
            frame = _skin_frame(seed=seed)
            ok, enc = cv2.imencode(".jpg", frame)
            data = enc.tobytes()
            r_native = engine.analyze_jpeg(data, "native")
            assert r_native is not None, "native prep path did not engage"
            decoded = ni.decode_jpeg(data)
            r_python = engine.analyze(decoded, "python")
            assert r_native["analysis_mode"] == r_python["analysis_mode"]
            assert abs(r_native["fake_probability"]
                       - r_python["fake_probability"]) < 5e-3
            if "face_bbox" in r_python:
                assert r_native["face_bbox"] == r_python["face_bbox"]
    finally:
        engine.shutdown()
