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
from real_time_video_deepfake_detection_tpu.kernels.forensic_stats import (
    noise_block_stats_pallas,
)
from real_time_video_deepfake_detection_tpu.pipeline.classify import (
    preprocess_aligned,
)
from real_time_video_deepfake_detection_tpu.ops.forensics import _block_stats
from real_time_video_deepfake_detection_tpu.ops.color import bgr_to_gray_u8
from real_time_video_deepfake_detection_tpu.ops.filters import gaussian_blur5_f32

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


def test_noise_block_stats_kernel():
    frames = rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8)
    means, stds = noise_block_stats_pallas(jnp.asarray(frames), interpret=True)
    for i in range(2):
        gray = bgr_to_gray_u8(jnp.asarray(frames[i])).astype(jnp.float32)
        noise = gray - gaussian_blur5_f32(gray)
        ref_mean, ref_std = _block_stats(noise, 32)
        np.testing.assert_allclose(np.asarray(means[i]).reshape(-1),
                                   np.asarray(ref_mean), atol=1e-3)
        np.testing.assert_allclose(np.asarray(stds[i]).reshape(-1),
                                   np.asarray(ref_std), atol=1e-3)


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
