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


def test_detector_loads_cwd_calibrator(tmp_path, monkeypatch):
    """The operator loop: `rtvdd-train --fit-calibrator` writes
    weights/calibrator.pkl (IsotonicCalibrator dict format); a detector
    constructed from that working directory must pick it up and apply it
    (the raw pickle.load of the dict used to fail predict_proba and
    silently no-op)."""
    import numpy as np

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    from real_time_video_deepfake_detection_tpu.train.calibration import (
        IsotonicCalibrator,
    )

    (tmp_path / "weights").mkdir()
    cal = IsotonicCalibrator().fit(
        np.linspace(0.1, 0.9, 20), (np.arange(20) >= 8).astype(int))
    cal.save(str(tmp_path / "weights" / "calibrator.pkl"))
    monkeypatch.chdir(tmp_path)

    det = DeepfakeDetector(DetectorConfig())
    assert det.calibrator is not None
    want = float(cal.predict_proba([[0.3]])[0][1])
    assert det.apply_calibration(0.3) == pytest.approx(want)
    assert det.apply_calibration(0.3) != 0.3


def test_cwd_legacy_pickle_refused(tmp_path, monkeypatch, caplog):
    """Round-3 advisor item: a legacy pickle calibrator planted in the
    serving CWD must NOT be unpickled by auto-load (code-execution surface);
    save() now writes an .npz payload which auto-load accepts."""
    import logging
    import pickle

    from real_time_video_deepfake_detection_tpu.train.calibration import (
        IsotonicCalibrator, load_default,
    )

    monkeypatch.chdir(tmp_path)
    with open("calibrator.pkl", "wb") as f:
        pickle.dump({"x": np.array([0.0, 1.0]), "y": np.array([0.0, 1.0])}, f)
    with caplog.at_level(logging.WARNING):
        assert load_default() is None
    assert "legacy pickle" in caplog.text and "ignoring" in caplog.text

    # explicit trusted load still works for operator-supplied files
    cal = IsotonicCalibrator.load("calibrator.pkl", allow_pickle=True)
    assert cal.transform(np.array([0.5]))[0] == pytest.approx(0.5)

    # the .npz payload save() writes IS auto-loaded (same filename)
    IsotonicCalibrator().fit([0.1, 0.9], [0, 1]).save("calibrator.pkl")
    with caplog.at_level(logging.WARNING):
        assert load_default() is not None


def test_corrupt_npz_diagnosed_as_corruption(tmp_path):
    """A truncated/corrupt calibrator payload must NOT be misreported as a
    'legacy pickle' (which would steer operators toward allow_pickle=True
    on a file that was never a calibrator); load() raises a corruption
    message instead."""
    import pytest
    from real_time_video_deepfake_detection_tpu.train.calibration import (
        IsotonicCalibrator,
    )
    cal = IsotonicCalibrator().fit(
        np.linspace(0, 1, 32), (np.linspace(0, 1, 32) > 0.5).astype(float))
    path = tmp_path / "calibrator.pkl"
    cal.save(str(path))
    data = path.read_bytes()
    path.write_bytes(data[: len(data) // 2])  # truncate: disk-full analogue
    with pytest.raises(ValueError, match="corrupt/unreadable"):
        IsotonicCalibrator.load(str(path))
    # while a REAL legacy pickle still gets the legacy-pickle diagnosis
    import pickle
    legacy = tmp_path / "legacy.pkl"
    legacy.write_bytes(pickle.dumps({"x": np.array([0.0, 1.0]),
                                     "y": np.array([0.0, 1.0])}))
    with pytest.raises(ValueError, match="legacy pickle"):
        IsotonicCalibrator.load(str(legacy))
