"""Pallas kernel vs pure-jnp reference equivalence (SURVEY.md §4 test
strategy item (b)). Runs in interpreter mode on CPU; the same kernels
compile for TPU."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.kernels.preproc import (
    preprocess_faces_pallas,
)
from real_time_video_deepfake_detection_tpu.pipeline.classify import (
    preprocess_aligned,
)
from real_time_video_deepfake_detection_tpu.ops.color import bgr_to_gray_u8

rng = np.random.default_rng(55)


def test_preproc_kernel_matches_reference_path():
    faces = rng.random((3, 160, 160, 3), dtype=np.float32) * 255
    ref = np.stack([np.asarray(preprocess_aligned(jnp.asarray(f)))
                    for f in faces])
    out = np.asarray(preprocess_faces_pallas(jnp.asarray(faces), interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_preproc_kernel_other_sizes():
    faces = rng.random((2, 96, 128, 3), dtype=np.float32) * 255
    out = np.asarray(preprocess_faces_pallas(jnp.asarray(faces), interpret=True))
    assert out.shape == (2, 224, 224, 3)
    ref = np.stack([np.asarray(preprocess_aligned(jnp.asarray(f)))
                    for f in faces])
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_color_kernel_matches_reference():
    import cv2, sys
    sys.path.insert(0, "/root/reference")
    from frame_analysis import FrameForensicAnalyzer
    from real_time_video_deepfake_detection_tpu.kernels.color_stats import (
        color_scores_batch, unique_hue_count_pallas,
    )
    fa = FrameForensicAnalyzer()
    frames = np.concatenate([
        rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8),
        np.full((1, 256, 256, 3), 128, np.uint8)])
    scores = np.asarray(color_scores_batch(jnp.asarray(frames), interpret=True))
    hues = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2HSV)[..., 0] for f in frames])
    uniq = np.asarray(unique_hue_count_pallas(jnp.asarray(hues), interpret=True))
    for i, f in enumerate(frames):
        assert scores[i] == pytest.approx(fa._analyze_color(f), abs=1e-6)
        assert int(uniq[i]) == len(np.unique(hues[i]))


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(256, 256), (160, 160), (128, 192)])
def test_clahe_kernels_match_cv2(shape):
    import cv2
    from real_time_video_deepfake_detection_tpu.kernels.clahe import (
        clahe_u8_pallas,
    )
    src = rng.integers(0, 256, shape, dtype=np.uint8)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(src)
    out = np.asarray(clahe_u8_pallas(jnp.asarray(src), interpret=True))
    d = np.abs(ref.astype(int) - out.astype(int))
    # exact up to float .5-tie rounding in the bilinear weights
    assert d.max() <= 1
    assert (d > 0).mean() < 0.005


def test_jnp_lab_matches_native_c():
    """ops/color rgb_to_lab_u8 / lab_to_rgb_u8 vs the native C tables
    (native/ingest.cpp) — bit-identical on random u8 input."""
    from real_time_video_deepfake_detection_tpu.ops.color import (
        lab_to_rgb_u8, rgb_to_lab_u8,
    )
    from real_time_video_deepfake_detection_tpu.utils import native_ingest as ni
    if ni.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    bgr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    lab_j = np.asarray(rgb_to_lab_u8(jnp.asarray(bgr[:, :, ::-1].copy())))
    lab_c = ni.bgr2lab_native(bgr)
    # C path gamma uses a 4097-point lerp table and cbrtf (1-ulp class
    # differences): +-1 LSB on rounding boundaries, same tolerance the
    # native implementation documents vs cv2
    d = np.abs(lab_j.astype(int) - lab_c.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 0.02
    rgb_j = np.asarray(lab_to_rgb_u8(jnp.asarray(lab_c)))
    bgr_c = ni.lab2bgr_native(lab_c)
    d2 = np.abs(rgb_j[:, :, ::-1].astype(int) - bgr_c.astype(int))
    assert d2.max() <= 1 and (d2 > 0).mean() < 0.02


def test_classify_batch_pallas_preproc_flag():
    """classify_batch(pallas_preproc=True) (interpret on CPU) matches the
    XLA preproc path."""
    import jax
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.pipeline.classify import (
        classify_batch,
    )
    if jax.default_backend() == "cpu":
        pytest.skip("pallas preproc compiles on TPU; interpret covered by "
                    "test_preproc_kernel")
    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    faces = jnp.asarray(rng.random((4, 160, 160, 3), dtype=np.float32) * 255)
    a = classify_batch(params, faces, spec)
    b = classify_batch(params, faces, spec, 224, False, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
