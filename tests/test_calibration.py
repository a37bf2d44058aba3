"""Isotonic calibrator tests (reference C7's optional calibrator support)."""

import numpy as np
import pytest

from real_time_video_deepfake_detection_tpu.train.calibration import (
    IsotonicCalibrator,
)


def test_fit_monotone_and_calibrated():
    rng = np.random.default_rng(0)
    p = rng.random(2000)
    y = (rng.random(2000) < p ** 2).astype(int)
    cal = IsotonicCalibrator().fit(p, y)
    xs = np.linspace(0.05, 0.95, 10)
    out = cal.transform(xs)
    assert np.all(np.diff(out) >= -1e-9)
    assert np.abs(out - xs ** 2).mean() < 0.05


def test_predict_proba_surface():
    cal = IsotonicCalibrator().fit([0.1, 0.9], [0, 1])
    pp = cal.predict_proba([[0.5]])
    assert pp.shape == (1, 2)
    assert pp.sum() == pytest.approx(1.0)


def test_save_load_roundtrip(tmp_path):
    cal = IsotonicCalibrator().fit([0.1, 0.4, 0.9], [0, 1, 1])
    path = str(tmp_path / "cal.pkl")
    cal.save(path)
    cal2 = IsotonicCalibrator.load(path)
    xs = np.linspace(0, 1, 7)
    np.testing.assert_allclose(cal2.transform(xs), cal.transform(xs))


def test_detector_applies_pickled_calibrator(tmp_path):
    """The detector's apply_calibration must consume the saved artifact
    (deepfake_detection.py:445-455 surface)."""
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    det = DeepfakeDetector.__new__(DeepfakeDetector)
    det.calibrator = IsotonicCalibrator().fit([0.0, 1.0], [0, 1])
    assert det.apply_calibration(0.3) == pytest.approx(
        float(det.calibrator.predict_proba([[0.3]])[0][1]))
