"""Frequency features (C2) + GradCAM hook tests (reference
tests/test_algorithm.py:212-244 shape/dtype/range/sensitivity category)."""

import numpy as np
import pytest
import cv2
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.ops.freq_features import (
    compute_frequency_features, dct2, idct2,
)

rng = np.random.default_rng(91)


def test_dct2_matches_cv2():
    x = rng.random((64, 48)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(dct2(jnp.asarray(x))), cv2.dct(x),
                               atol=1e-5)


def test_idct_roundtrip():
    x = rng.random((32, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(idct2(dct2(jnp.asarray(x)))), x,
                               atol=1e-5)


def test_freq_features_shape_dtype_range():
    img = rng.integers(0, 256, (300, 260, 3), dtype=np.uint8)
    out = np.asarray(compute_frequency_features(jnp.asarray(img)))
    assert out.shape == (2, 224, 224)
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_freq_features_match_reference_formula():
    img = rng.integers(0, 256, (300, 260, 3), dtype=np.uint8)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    gray = cv2.resize(gray, (224, 224)).astype(np.float32)
    mag = np.log1p(np.abs(np.fft.fftshift(np.fft.fft2(gray))))
    mag = (mag - mag.min()) / (mag.max() - mag.min())
    d = np.log1p(np.abs(cv2.dct(gray / 255.0)))
    d = (d - d.min()) / (d.max() - d.min())
    ref = np.stack([mag, d])
    out = np.asarray(compute_frequency_features(jnp.asarray(img)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_freq_features_sensitive_to_content():
    smooth = np.full((224, 224, 3), 128, np.uint8)
    noisy = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    a = np.asarray(compute_frequency_features(jnp.asarray(smooth)))
    b = np.asarray(compute_frequency_features(jnp.asarray(noisy)))
    assert np.abs(a - b).mean() > 0.01


@pytest.mark.slow
def test_gradcam_shape_and_range():
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.models.gradcam import gradcam
    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    cam = np.asarray(gradcam(params, x, spec))
    assert cam.shape == (2, 224, 224)
    assert cam.min() >= 0.0 and cam.max() <= 1.0
