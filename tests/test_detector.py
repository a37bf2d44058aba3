"""Detector orchestration + CLAHE tests (reference tests/test_functional.py
detector-integration category)."""

import numpy as np
import pytest
import cv2
import jax

from real_time_video_deepfake_detection_tpu.core.config import DetectorConfig
from real_time_video_deepfake_detection_tpu.ops.clahe import clahe_u8_numpy, clahe_u8_jnp
from real_time_video_deepfake_detection_tpu.pipeline.detector import (
    DeepfakeDetector, preprocess_face_quality,
)
from real_time_video_deepfake_detection_tpu.pipeline.faces import (
    FaceDetector, extract_face_region,
)

rng = np.random.default_rng(13)


# ----------------------------------------------------------------- CLAHE

@pytest.mark.parametrize("shape", [(256, 256), (200, 176), (104, 120), (96, 112)])
def test_clahe_divisible_bit_exact(shape):
    src = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(src)
    np.testing.assert_array_equal(clahe_u8_numpy(src), ref)


def test_clahe_jnp_matches_numpy():
    src = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    np.testing.assert_array_equal(np.asarray(clahe_u8_jnp(src)), clahe_u8_numpy(src))


def test_clahe_batch_matches_oracle():
    """The batched serving CLAHE (ops/clahe.clahe_u8_batch — the one-hot
    matmul formulation the device tick uses): LUT stage bit-exact, final
    f32 lerp within +-1 LSB on <1% of pixels (fma contraction; documented
    in DESIGN.md Known numeric deviations)."""
    import jax
    import jax.numpy as jnp
    from real_time_video_deepfake_detection_tpu.ops.clahe import clahe_u8_batch

    imgs = rng.integers(0, 256, (4, 160, 160), dtype=np.uint8)
    imgs[1] = 128   # uniform: must be exactly preserved
    out = np.asarray(jax.jit(clahe_u8_batch)(jnp.asarray(imgs)))
    for i in range(len(imgs)):
        want = clahe_u8_numpy(imgs[i])
        d = np.abs(out[i].astype(int) - want.astype(int))
        assert d.max() <= 1, (i, d.max())
        assert (d > 0).mean() < 0.01, (i, (d > 0).mean())
    np.testing.assert_array_equal(out[1], clahe_u8_numpy(imgs[1]))


@pytest.mark.parametrize("shape", [
    (200, 180),    # one dim divisible: cv2 pads it a FULL extra tile
    (121, 160), (160, 97),
    (155, 155), (37, 41),   # both non-divisible
])
def test_clahe_nondivisible_matches_cv2(shape):
    """cv2 5.0's literal padding rule (ops/clahe._cv2_pad_amounts) makes
    non-divisible geometry exact; the only residual is cv2's own
    build-dependent f32 lerp ties: |diff| <= 1 on <0.5% of pixels (the same
    residual exists at SOME divisible sizes — see ops/clahe.py)."""
    src = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(src)
    out = clahe_u8_numpy(src)
    d = np.abs(ref.astype(int) - out.astype(int))
    assert d.max() <= 1, (shape, d.max())
    assert (d > 0).mean() < 0.01, (shape, (d > 0).mean())


def test_preprocess_face_quality_shape_and_type():
    face = rng.integers(0, 256, (130, 110, 3), dtype=np.uint8)
    out = preprocess_face_quality(face)
    assert out.shape == face.shape and out.dtype == np.uint8


@pytest.mark.parametrize("backend", ["native", "jnp"])
def test_preprocess_face_quality_ladder_parity(backend):
    """The cv2-free Lab rungs (native C, jnp — round-4 verdict weak #4).

    The Lab CONVERSION is within 2 u8 steps of cv2 (measured; cv2's u8
    BGR2LAB is fixed-point table math, ours the float formula — DESIGN.md
    Known numeric deviations). Through CLAHE a +-1 L step is amplified by
    the local tile-LUT slope (scaled-CDF mapping), so the full-path bound
    is input-dependent: tight on natural/smooth content, wide on white
    noise (tiny 15x12 tiles, <1 count/bin). Assert the typical case tight
    and the noise worst case by mean."""
    if backend == "native":
        from real_time_video_deepfake_detection_tpu.utils.native_ingest import get_lib
        if get_lib() is None:
            pytest.skip("native ingest library unavailable")
    yy, xx = np.mgrid[0:120, 0:96]
    smooth = np.stack([120 + 60 * np.sin(yy / 17) + 40 * np.cos(xx / 13),
                       100 + 50 * np.sin(xx / 11),
                       90 + 70 * np.cos(yy / 23)], -1).clip(0, 255).astype(np.uint8)
    noise = rng.integers(0, 256, (120, 96, 3), dtype=np.uint8)
    for img, mean_tol, p99_tol in ((smooth, 1.5, 6), (noise, 5.0, 24)):
        ref = preprocess_face_quality(img, lab_backend="cv2")
        out = preprocess_face_quality(img, lab_backend=backend)
        assert out.shape == img.shape and out.dtype == np.uint8
        d = np.abs(ref.astype(int) - out.astype(int))
        assert d.mean() <= mean_tol, (backend, d.mean())
        assert np.quantile(d, 0.99) <= p99_tol, (backend, np.quantile(d, 0.99))
    # the two cv2-free rungs agree with each other bit-for-bit (+-1 from
    # the C gamma table's lerp at rounding boundaries, amplified <=1 LUT step)
    if backend == "native":
        a = preprocess_face_quality(noise, lab_backend="native")
        b = preprocess_face_quality(noise, lab_backend="jnp")
        assert np.abs(a.astype(int) - b.astype(int)).mean() <= 0.5


def test_cv2less_backend_resolution_warns_once(monkeypatch):
    """On a cv2-less install the ladder resolves to a real backend and
    warns ONCE (was: silent forensic-only downgrade via analyze_face's
    blanket except)."""
    import builtins
    import warnings as _w
    from real_time_video_deepfake_detection_tpu.pipeline import detector as D

    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("cv2 disabled for test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    monkeypatch.setattr(D, "_LAB_BACKEND", None)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        backend = D._resolve_lab_backend()
        assert backend in ("native", "jnp")
        again = D._resolve_lab_backend()   # cached: no second warning
        assert again == backend
    msgs = [str(r.message) for r in rec if r.category is RuntimeWarning]
    assert len(msgs) == 1 and "cv2 unavailable" in msgs[0]
    # and the face-quality path actually runs without cv2
    face = rng.integers(0, 256, (80, 72, 3), dtype=np.uint8)
    out = D.preprocess_face_quality(face, lab_backend=backend)
    assert out.shape == face.shape and out.dtype == np.uint8
    monkeypatch.setattr(D, "_LAB_BACKEND", None)   # leave clean for others


def test_analyze_face_downgrade_warns_once():
    """analyze_face's reference-contract blanket except (fall back to
    forensic-only, deepfake_detection.py:548-550) must warn on FIRST
    failure instead of silently changing verdict composition."""
    import warnings as _w
    det = DeepfakeDetector(DetectorConfig())
    det.use_tta = False
    det._single_prediction = lambda *_: (_ for _ in ()).throw(
        RuntimeError("synthetic face-path failure"))
    face = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert det.analyze_face(face) == (None, None, None)
        assert det.analyze_face(face) == (None, None, None)
    msgs = [str(r.message) for r in rec if r.category is RuntimeWarning]
    assert len(msgs) == 1 and "forensic-only" in msgs[0]


# ------------------------------------------------------------ face detector

def test_face_detector_guards():
    det = FaceDetector()
    assert det(None) == []
    assert det(np.zeros((10, 10, 3), np.uint8)) == []
    assert det(np.zeros((0, 0, 3), np.uint8)) == []
    assert isinstance(det(rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)), list)


def test_extract_face_region_bounds():
    frame = rng.integers(0, 256, (100, 100, 3), dtype=np.uint8)
    r = extract_face_region(frame, (90, 90, 30, 30), padding=5)
    assert r.shape[0] > 0 and r.shape[1] > 0


# --------------------------------------------------------------- detector

@pytest.fixture(scope="module")
def detector():
    return DeepfakeDetector(DetectorConfig())


def test_predict_no_face(detector):
    detector.reset()
    frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    annotated, trigger, fframe, data = detector.predict(frame)
    assert annotated.shape == frame.shape
    assert data["analysis_mode"] == "frame_only"
    assert data["frame_count"] == 1
    assert data["faces_detected"] == 0
    assert 0.0 <= data["frame_forensic"]["fake_probability"] <= 1.0
    assert data["confidence_level"] == "UNCERTAIN"


def test_predict_forensic_schedule(detector):
    """Library path: full forensics on frames 1,4,7 (count incremented
    BEFORE forensics; count%3==0 -> frames where (n)%3==1 after increment...
    concretely: frame_count becomes 1,2,3,... and full iff count%3==0 is
    checked pre-increment in analyze_frame_forensics via self.frame_count
    already incremented -> full at counts 3,6,... plus the very first call
    count=1? No: predict() increments first, so forensics sees count 1,2,3:
    full iff count%3==0 -> frames 3,6,9."""
    detector.reset()
    types = []
    frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    for _ in range(6):
        _, _, _, data = detector.predict(frame)
        types.append(data["frame_forensic"]["analysis_type"])
    assert types[2] == "frame_forensic"          # count 3
    assert types[0] == "frame_forensic_fast"     # count 1
    assert types[5] == "frame_forensic"          # count 6


def test_detector_reset_full(detector):
    frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    for _ in range(5):
        detector.predict(frame)
    detector.reset()
    assert detector.frame_count == 0
    assert detector.temporal_tracker.get_voting_stats()["total_frames"] == 0
    assert not bool(detector.forensic_state.has_prev)


def test_analyze_face_on_synthetic(detector):
    face = np.full((160, 160, 3), 150, np.uint8)
    cv2.circle(face, (80, 80), 50, (120, 140, 180), -1)
    prob, prob2, gradcam = detector.analyze_face(face)
    assert prob is not None
    assert 0.0 <= prob <= 1.0
    assert prob == prob2
    assert gradcam is None


def test_analyze_face_gradcam_enabled():
    """enable_gradcam=True returns a live (224,224) [0,1] heatmap through
    analyze_face (the reference ships the flag permanently disabled,
    deepfake_detection.py:543-544; here it works)."""
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    det = DeepfakeDetector(DetectorConfig(), enable_gradcam=True)
    face = np.full((160, 160, 3), 150, np.uint8)
    cv2.circle(face, (80, 80), 50, (120, 140, 180), -1)
    prob, _, cam = det.analyze_face(face)
    assert prob is not None
    assert cam is not None and cam.shape == (224, 224)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0


def test_predict_collects_gradcams_per_face():
    """predict() exposes each face's heatmap as (bbox, cam) pairs in
    last_gradcams — what `rtvdd-analyze --gradcam` blends into the
    annotated output — and clears them on the next call."""
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    det = DeepfakeDetector(DetectorConfig(), enable_gradcam=True)
    assert det.last_gradcams == []
    frame = np.full((240, 320, 3), 70, np.uint8)
    cv2.ellipse(frame, (160, 120), (50, 70), 0, 0, 360, (120, 140, 180), -1)
    _, _, _, data = det.predict(frame)
    if data["faces_detected"] and data["face_results"]:
        assert len(det.last_gradcams) == len(data["face_results"])
        (x, y, w, h), cam = det.last_gradcams[0]
        assert cam.shape == (224, 224)
        assert (w, h) == (data["face_results"][0]["bbox"]["w"],
                          data["face_results"][0]["bbox"]["h"])
    # no-face frame clears the collection
    det.predict(np.zeros((240, 320, 3), np.uint8))
    assert det.last_gradcams == []


def test_small_face_heuristic(detector):
    from real_time_video_deepfake_detection_tpu.pipeline.classify import (
        apply_small_face_heuristic,
    )
    assert apply_small_face_heuristic(0.5, 60, 60) == pytest.approx(0.6)
    assert apply_small_face_heuristic(0.5, 100, 100) == pytest.approx(0.5)
    assert apply_small_face_heuristic(0.95, 60, 60) == 1.0


def test_endurance_50_frames(detector):
    """(reference tests/test_reliability.py:297-320)."""
    detector.reset()
    frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    for i in range(50):
        _, _, _, data = detector.predict(frame)
    assert data["frame_count"] == 50
    assert detector.temporal_tracker.get_voting_stats()["total_frames"] == 10


def test_fusion_weights_assignable(detector):
    """Reference code mutates face_weight/forensic_weight as plain instance
    attributes (deepfake_detection.py:315-316); the properties must accept
    assignment and write through to the single cfg source of truth (what
    the batched tick reads)."""
    old = detector.face_weight
    try:
        detector.face_weight = 0.6
        detector.forensic_weight = 0.4
        assert detector.face_weight == 0.6
        assert detector.cfg.face_weight == 0.6
        assert detector.cfg.forensic_weight == 0.4
    finally:
        detector.face_weight = old
        detector.forensic_weight = 1.0 - old


def test_detector_loads_trainer_npz_checkpoints(tmp_path):
    """The serving entry points accept every checkpoint flavor the shared
    loader knows (utils/weights.py): the reference .pth AND the trainer's
    .npz (best-model EMA params or a full TrainState resume file). Round-4
    regression: DeepfakeDetector routed .npz into the torch deserializer."""
    from real_time_video_deepfake_detection_tpu.models import backbones
    from real_time_video_deepfake_detection_tpu.train.checkpoint import (
        save_checkpoint,
    )

    spec = backbones.make("b0")
    params = backbones.init_params(jax.random.PRNGKey(0), spec)
    path = str(tmp_path / "best_model.npz")
    save_checkpoint(path, params,
                    {"epoch": 3, "val_acc": 0.99, "val_f1": 0.98,
                     "config": {"image_size": 40}})

    det = DeepfakeDetector(weights_path=path, use_tta=False)
    assert det.model_loaded
    # metadata surfaces like the reference's loaded-model attributes
    # (deepfake_detection.py:64-70)
    assert det.checkpoint_meta["epoch"] == 3
    assert det.checkpoint_meta["val_acc"] == 0.99
    p, conf, _ = det.analyze_face(
        np.full((72, 72, 3), 120, np.uint8))
    assert p is not None and 0.0 <= p <= 1.0
