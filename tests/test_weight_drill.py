"""End-to-end real-weight drill (VERDICT #7): synthesize a reference-schema
best_model.pth, load it through the server's --weights path, and assert the
served /analyze probabilities equal the torch-computed reference path within
1e-3 over a frame sequence, with identical verdict sequences.

Chain under test: torch checkpoint file -> convert_state_dict -> server ->
JSON (deepfake_detection.py:44-70 load; SURVEY §2.2 converter requirement).
"""

import io

import numpy as np
import pytest
import torch

from real_time_video_deepfake_detection_tpu.core.config import (
    DetectorConfig, ServerConfig,
)
from real_time_video_deepfake_detection_tpu.models.efficientnet import (
    EfficientNetSpec,
)
from real_time_video_deepfake_detection_tpu.pipeline.detector import (
    DeepfakeDetector, _ResizeAligner, preprocess_face_quality,
)
from real_time_video_deepfake_detection_tpu.serving.server import create_app
from real_time_video_deepfake_detection_tpu.state.tracker import TemporalTracker
from real_time_video_deepfake_detection_tpu.utils.torch_convert import (
    build_torch_reference_predictor, make_reference_shaped_state_dict,
)

pytestmark = pytest.mark.slow

BOX = (30, 25, 96, 112)        # x, y, w, h — >=80px so no small-face boost
N_FRAMES = 14
THRESHOLD = 0.55


def _frames(n=N_FRAMES, seed=17):
    g = np.random.default_rng(seed)
    out = []
    for t in range(n):
        yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
        base = 110 + 60 * np.sin(xx / (19 + t)) + 40 * np.cos(yy / 23)
        img = np.stack([base, base * 0.9, base * 0.8], -1)
        img += g.normal(0, 10, img.shape)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def test_checkpoint_to_server_to_json_parity(tmp_path):
    spec = EfficientNetSpec.make("b0")
    sd = make_reference_shaped_state_dict(spec, seed=3)
    ckpt = {
        "model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in sd.items()},
        "epoch": 8, "val_acc": 0.918, "config": {"note": "synthesized"},
    }
    pth = tmp_path / "best_model.pth"
    torch.save(ckpt, pth)

    det = DeepfakeDetector(DetectorConfig().with_threshold(THRESHOLD),
                           weights_path=str(pth))
    assert det.model_loaded
    assert det.checkpoint_meta["epoch"] == 8
    det.face_detector = lambda frame: [BOX]
    app = create_app(det, ServerConfig(detection_threshold=THRESHOLD,
                                       min_request_interval=0.0))
    client = app.test_client()

    torch_predict = build_torch_reference_predictor(sd, spec)
    aligner = _ResizeAligner()
    tracker = TemporalTracker(detection_threshold=THRESHOLD)

    import cv2
    x, y, w, h = BOX
    for i, frame in enumerate(_frames()):
        ok, enc = cv2.imencode(".jpg", frame)
        assert ok
        r = client.post("/analyze",
                        data={"frame": (io.BytesIO(enc.tobytes()), "f.jpg")})
        assert r.status_code == 200, r.data
        served = r.get_json()
        assert served["analysis_mode"] == "face+frame"

        # torch reference path on the decoded (post-JPEG) frame with the
        # same host prep (CLAHE + aligner), then torch resize/norm/B0/head.
        decoded = cv2.imdecode(np.frombuffer(enc.tobytes(), np.uint8),
                               cv2.IMREAD_COLOR)
        crop = decoded[y:y + h, x:x + w]
        aligned = aligner(preprocess_face_quality(crop))
        p_torch = torch_predict(aligned)

        assert abs(served["face_probability"] - p_torch) < 1e-3, (
            f"frame {i}: served {served['face_probability']} vs torch {p_torch}")
        assert abs(served["fake_probability"] - p_torch) < 1e-3

        # verdict parity: feed the torch probability into the same tracker
        # semantics and require the identical verdict sequence.
        tracker.update(p_torch)
        assert served["confidence_level"] == tracker.get_confidence_level(), (
            f"frame {i}")

    # after 14 frames the voting window (10) is full: a real verdict emerged
    assert served["confidence_level"] in ("REAL", "FAKE")
    assert served["frame_count"] == N_FRAMES
