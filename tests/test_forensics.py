"""Golden parity tests: forensic ops vs OpenCV / the reference analyzer.

Mirrors the reference's algorithm tests (tests/test_algorithm.py:161-244:
directional correctness on synthetic images, weighted-sum exactness) and adds
bit-exactness goldens for every underlying cv2 op we re-implemented.
"""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.ops.color import (
    bgr_to_gray_u8, bgr_to_hsv_u8,
)
from real_time_video_deepfake_detection_tpu.ops.resize import (
    resize_bilinear_u8_cv2, resize_bilinear_f32,
)
from real_time_video_deepfake_detection_tpu.ops.filters import (
    gaussian_blur5_f32, laplacian4, canny,
)
from real_time_video_deepfake_detection_tpu.ops.jpeg import jpeg_roundtrip_bgr
from real_time_video_deepfake_detection_tpu.ops import forensics
from real_time_video_deepfake_detection_tpu.state.forensic_state import (
    forensic_state_init,
)

from .conftest import reference_available

rng = np.random.default_rng(7)


def _rand_img(h=256, w=256):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


# ------------------------------------------------------------- cv2 op parity

def test_gray_bit_exact():
    img = _rand_img()
    np.testing.assert_array_equal(
        np.asarray(bgr_to_gray_u8(img)), cv2.cvtColor(img, cv2.COLOR_BGR2GRAY))


def test_hsv_bit_exact():
    img = _rand_img()
    np.testing.assert_array_equal(
        np.asarray(bgr_to_hsv_u8(img)), cv2.cvtColor(img, cv2.COLOR_BGR2HSV))


@pytest.mark.parametrize("shape", [(480, 640), (720, 1280), (512, 512), (1080, 1920)])
def test_resize_to_256_bit_exact(shape):
    img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
    ref = cv2.resize(img, (256, 256), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_array_equal(np.asarray(resize_bilinear_u8_cv2(img, 256, 256)), ref)


def test_resize_f32_matches_torch_semantics():
    # half-pixel bilinear; compare against exact numpy reference
    x = rng.random((160, 160, 3), dtype=np.float32)
    out = np.asarray(resize_bilinear_f32(x, 224, 224))
    assert out.shape == (224, 224, 3)
    assert np.isfinite(out).all()
    # endpoints: first/last sample rows equal edge clamp behavior
    assert abs(out[0, 0, 0] - x[0, 0, 0]) < 0.5


def test_resize_f32_u8_fast_path_bit_identical():
    # the u8 one-hot-matmul horizontal pass must reproduce the f32 gather
    # form bit-for-bit (ops/resize.py resize_bilinear_f32 docstring)
    img = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
    via_u8 = np.asarray(resize_bilinear_f32(jnp.asarray(img), 224, 224))
    via_f32 = np.asarray(
        resize_bilinear_f32(jnp.asarray(img, jnp.float32), 224, 224))
    np.testing.assert_array_equal(via_u8, via_f32)


def test_gaussian_blur5_bit_exact():
    g = cv2.cvtColor(_rand_img(), cv2.COLOR_BGR2GRAY).astype(np.float32)
    ref = cv2.GaussianBlur(g, (5, 5), 0)
    np.testing.assert_allclose(np.asarray(gaussian_blur5_f32(g)), ref, atol=0)


def test_laplacian_bit_exact():
    g = cv2.cvtColor(_rand_img(), cv2.COLOR_BGR2GRAY)
    ref = cv2.Laplacian(g, cv2.CV_64F)
    np.testing.assert_allclose(np.asarray(laplacian4(g)), ref, atol=0)


@pytest.mark.parametrize("blur", [0, 3, 7])
def test_canny_bit_exact(blur):
    g = cv2.cvtColor(_rand_img(), cv2.COLOR_BGR2GRAY)
    if blur:
        g = cv2.GaussianBlur(g, (blur, blur), 0)
    ref = cv2.Canny(g, 50, 150)
    np.testing.assert_array_equal(np.asarray(canny(g)), ref)


@pytest.mark.slow
def test_jpeg_roundtrip_bit_exact():
    for img in [_rand_img(),
                cv2.GaussianBlur(_rand_img(), (21, 21), 8),
                np.tile(np.arange(256, dtype=np.uint8)[None, :, None], (256, 1, 3))]:
        ok, enc = cv2.imencode(".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), 90])
        ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(np.asarray(jpeg_roundtrip_bgr(img)), ref)


# -------------------------------------------------- directional signal checks
# (reference tests/test_algorithm.py:161-205 style)

def _smooth_img():
    return np.full((256, 256, 3), 128, np.uint8)


def _noisy_img():
    return rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)


def test_edge_score_directional():
    smooth = float(forensics.edge_score(bgr_to_gray_u8(_smooth_img())))
    noisy = float(forensics.edge_score(bgr_to_gray_u8(_noisy_img())))
    assert smooth > noisy  # smooth/over-generated content scores more suspicious


def test_noise_score_directional():
    g_smooth = bgr_to_gray_u8(_smooth_img()).astype(jnp.float32)
    g_noisy = bgr_to_gray_u8(_noisy_img()).astype(jnp.float32)
    assert float(forensics.noise_score(g_smooth)) > float(forensics.noise_score(g_noisy))


def test_color_score_directional():
    uniform = float(forensics.color_score(_smooth_img()))
    varied = float(forensics.color_score(_noisy_img()))
    assert uniform > varied


def test_scores_in_range():
    img = _noisy_img()
    state = forensic_state_init()
    res, _ = forensics.analyze_frame(img, state, True)
    for k in ["frequency", "noise", "ela", "edge", "color", "temporal",
              "fake_probability"]:
        v = float(res[k])
        assert 0.0 <= v <= 1.0, k


# ------------------------------------------- end-to-end parity vs reference

@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sequence_parity_vs_reference():
    """20-frame video sequence through full+fast scheduling: every signal and
    the combined probability must match the reference analyzer to 1e-6."""
    import sys
    sys.path.insert(0, "/root/reference")
    from frame_analysis import FrameForensicAnalyzer

    ref = FrameForensicAnalyzer()
    state = forensic_state_init()
    step = jax.jit(forensics.analyze_frame)

    base = cv2.GaussianBlur(_rand_img(480, 640), (9, 9), 3)
    for t in range(20):
        frame = base.copy()
        x = 50 + t * 10
        cv2.rectangle(frame, (x, 100), (x + 120, 260), (200, 50, 80), -1)
        frame = frame + rng.integers(0, 8, frame.shape, dtype=np.uint8)

        full = t % 3 == 0
        r_ref = ref.analyze(frame) if full else ref.analyze_fast(frame)
        resized = resize_bilinear_u8_cv2(frame, 256, 256)
        r_jax, state = step(resized, state, jnp.asarray(full))

        for k in r_ref["scores"]:
            assert abs(float(r_jax[k]) - r_ref["scores"][k]) < 1e-6, (t, k)
        assert abs(float(r_jax["fake_probability"]) - r_ref["fake_probability"]) < 1e-6, t


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_analyzer_class_drop_in_parity():
    """The reference-API FrameForensicAnalyzer wrapper (ops/forensics.py):
    same ctor/methods/schema, <=1e-6 parity against the reference class over
    a stateful full/fast sequence, reset() clears temporal state."""
    import sys
    sys.path.insert(0, "/root/reference")
    from frame_analysis import FrameForensicAnalyzer as RefAnalyzer

    from real_time_video_deepfake_detection_tpu.ops.forensics import (
        FrameForensicAnalyzer,
    )

    ref = RefAnalyzer()
    ours = FrameForensicAnalyzer()
    assert ours.weights == ref.weights

    base = cv2.GaussianBlur(_rand_img(480, 640), (7, 7), 2)
    frames = []
    for t in range(7):
        f = base.copy()
        cv2.circle(f, (100 + 20 * t, 200), 60, (180, 90, 60), -1)
        frames.append(f)

    for t, f in enumerate(frames):
        full = t % 3 == 0
        r_ref = ref.analyze(f) if full else ref.analyze_fast(f)
        r_our = ours.analyze(f) if full else ours.analyze_fast(f)
        assert r_our["analysis_type"] == r_ref["analysis_type"]
        assert r_our["frame_number"] == r_ref["frame_number"] == t + 1
        assert set(r_our["scores"]) == set(r_ref["scores"])
        for k in r_ref["scores"]:
            assert abs(r_our["scores"][k] - r_ref["scores"][k]) < 1e-6, (t, k)
        assert abs(r_our["fake_probability"]
                   - r_ref["fake_probability"]) < 1e-6, t

    ours.reset()
    ref.reset()
    assert ours.frame_count == 0
    r2 = ours.analyze(frames[0])
    assert r2["frame_number"] == 1
    # temporal state cleared: first frame after reset has no prev frame
    assert r2["scores"]["temporal"] == pytest.approx(
        ref.analyze(frames[0])["scores"]["temporal"], abs=1e-6)


@pytest.mark.slow
def test_batched_matches_single():
    from real_time_video_deepfake_detection_tpu.state.forensic_state import (
        forensic_state_init_batch,
    )
    frames = np.stack([_rand_img() for _ in range(4)])
    bstate = forensic_state_init_batch(4)
    res_b, _ = forensics.analyze_frame_batch(
        jnp.asarray(frames), bstate, jnp.ones((4,), bool))
    for i in range(4):
        res_s, _ = forensics.analyze_frame(frames[i], forensic_state_init(), True)
        np.testing.assert_allclose(
            float(res_b["fake_probability"][i]), float(res_s["fake_probability"]),
            atol=1e-6)


def test_recorded_golden_sequence():
    """Hermetic parity vs RECORDED reference outputs (SURVEY §4 item (a)):
    24-frame synthetic sequence, per-signal scores and combined probability
    captured from the reference analyzer into tests/golden_forensics.json."""
    import json
    import pathlib

    golden = json.loads(
        (pathlib.Path(__file__).parent / "golden_forensics.json").read_text())
    grng = np.random.default_rng(golden["seed"])
    base = cv2.GaussianBlur(
        grng.integers(0, 256, (480, 640, 3), np.uint8), (9, 9), 3)

    state = forensic_state_init()
    step = jax.jit(forensics.analyze_frame)
    for rec in golden["frames"]:
        t = rec["t"]
        frame = base.copy()
        x = 40 + t * 12
        cv2.rectangle(frame, (x, 90), (x + 130, 270), (190, 60, 70), -1)
        frame = frame + grng.integers(0, 6, frame.shape, dtype=np.uint8)
        resized = resize_bilinear_u8_cv2(frame, 256, 256)
        res, state = step(resized, state, jnp.asarray(rec["full"]))
        for k, v in rec["scores"].items():
            assert abs(float(res[k]) - v) < 1e-6, (t, k)
        assert abs(float(res["fake_probability"]) - rec["fake_probability"]) < 1e-6, t
