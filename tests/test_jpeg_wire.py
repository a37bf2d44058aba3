"""Wire-format JPEG ingest tests (ServerConfig.ingest_plane).

The serving tick can split the JPEG codec across host and device
(native/ingest.cpp ingest_decode_coefs_batch / ingest_decode_raw420_batch +
ops/jpeg_decode.py). The contract is BIT-exactness vs the full host decode
(the reference always full-decodes on host: backend_server.py:140-142
cv2.imdecode), plus automatic fallback for JPEGs the wire formats can't
carry (non-4:2:0 sampling, off-size frames, corrupt bytes).

Layers under test:
  - native entropy-only / raw-4:2:0 decode vs the native full decode
  - ops/jpeg_decode reconstruction (dequant -> islow IDCT -> fancy
    upsample -> YCbCr->BGR) bit-equal to libjpeg/cv2 full decode
  - MultiStreamEngine ingest_plane="coef"/"ycbcr420" response parity vs
    ingest_plane="bgr" on identical requests, incl. fallback entries
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from real_time_video_deepfake_detection_tpu.utils import native_ingest as NI
from real_time_video_deepfake_detection_tpu.ops.jpeg_decode import (
    bgr_from_coefs_420, bgr_from_ycbcr420,
)

rng = np.random.default_rng(23)

pytestmark = pytest.mark.skipif(
    NI.get_lib() is None, reason="native ingest library unavailable")


def _synth_frame(h=480, w=640, seed=0):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(yy // 3 + xx // 5) % 256, (xx // 2) % 256,
                    ((yy + xx) // 4) % 256], -1).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    img[h // 4:h // 2, w // 4:w // 2] = r.integers(
        0, 256, (h // 4, w // 4, 3), np.uint8)
    return img


def _encode(img, quality=85, progressive=False, sampling=None):
    flags = [cv2.IMWRITE_JPEG_QUALITY, quality]
    if progressive:
        flags += [cv2.IMWRITE_JPEG_PROGRESSIVE, 1]
    if sampling is not None:
        flags += [cv2.IMWRITE_JPEG_SAMPLING_FACTOR, sampling]
    ok, enc = cv2.imencode(".jpg", img, flags)
    assert ok
    return enc.tobytes()


@pytest.mark.parametrize("quality,progressive", [(75, False), (85, False),
                                                 (95, False), (85, True)])
def test_wire_planes_bit_exact(quality, progressive):
    """Both wire reconstructions equal the FULL native decode (which itself
    equals cv2.imdecode) bit-for-bit — baseline and progressive streams."""
    imgs = [_synth_frame(seed=s) for s in range(3)]
    datas = [_encode(im, quality, progressive) for im in imgs]
    fulls = [NI.decode_jpeg(d) for d in datas]
    refs = [cv2.imdecode(np.frombuffer(d, np.uint8), cv2.IMREAD_COLOR)
            for d in datas]
    for f, r in zip(fulls, refs):
        np.testing.assert_array_equal(f, r)

    coef_y, coef_c, qtab, ok = NI.decode_coefs_batch(datas, 480, 640)
    assert ok.all()
    rec = np.asarray(bgr_from_coefs_420(
        jnp.asarray(coef_y), jnp.asarray(coef_c), jnp.asarray(qtab),
        480, 640))
    for i, f in enumerate(fulls):
        np.testing.assert_array_equal(rec[i], f)

    y, c, ok2 = NI.decode_raw420_batch(datas, 480, 640)
    assert ok2.all()
    rec2 = np.asarray(bgr_from_ycbcr420(jnp.asarray(y), jnp.asarray(c)))
    for i, f in enumerate(fulls):
        np.testing.assert_array_equal(rec2[i], f)


def test_wire_quant_tables_natural_order():
    """The native decode must hand back quant tables in natural (raster)
    order — the order ops/jpeg.quant_table produces and the device dequant
    consumes."""
    from real_time_video_deepfake_detection_tpu.ops.jpeg import quant_table
    data = _encode(_synth_frame(), quality=90)
    _, _, qtab, ok = NI.decode_coefs_batch([data], 480, 640)
    assert ok[0]
    np.testing.assert_array_equal(qtab[0, 0], quant_table(90, False).ravel())
    np.testing.assert_array_equal(qtab[0, 1], quant_table(90, True).ravel())


def test_wire_eligibility_fallbacks():
    """Entries the wire formats can't carry are flagged ok=False — never
    mis-decoded: off-size frames, 4:4:4 sampling, grayscale, garbage —
    while eligible entries in the same batch still decode."""
    good = _encode(_synth_frame())
    offsize = _encode(_synth_frame(240, 320, seed=1))
    s444 = _encode(_synth_frame(seed=2),
                   sampling=getattr(cv2, "IMWRITE_JPEG_SAMPLING_FACTOR_444",
                                    0x111111))
    ok_gray, gray_enc = cv2.imencode(
        ".jpg", _synth_frame(seed=3)[:, :, 0],
        [cv2.IMWRITE_JPEG_QUALITY, 85])
    assert ok_gray
    garbage = b"\xff\xd8definitely-not-a-jpeg"

    datas = [good, offsize, s444, gray_enc.tobytes(), garbage, good]
    for fn in (NI.decode_coefs_batch, NI.decode_raw420_batch):
        out = fn(datas, 480, 640)
        ok = out[-1]
        assert list(ok) == [True, False, False, False, False, True], fn


def test_wire_padded_bucket_allocation():
    """pad_to allocates the padded bucket batch directly (rows beyond the
    input are never read by the device step — active=False)."""
    datas = [_encode(_synth_frame(seed=s)) for s in range(3)]
    coef_y, coef_c, qtab, ok = NI.decode_coefs_batch(datas, 480, 640,
                                                     pad_to=8)
    assert coef_y.shape[0] == 8 and coef_c.shape[0] == 8
    assert qtab.shape == (8, 2, 64) and ok.shape == (3,)
    # qtab padding rows are zeroed (garbage quant values could overflow the
    # int32 dequant in pathological combinations)
    assert (qtab[3:] == 0).all()


@pytest.mark.slow
@pytest.mark.parametrize("plane", ["coef", "ycbcr420"])
def test_engine_wire_matches_bgr(synth_ssd_wire, plane):
    """The SAME JPEG requests through ingest_plane="bgr" and the wire plane
    must produce identical responses — probabilities, verdicts, bboxes —
    including a fallback entry (odd-size JPEG -> full decode + host resize,
    bbox in client coordinates) and a corrupt entry (400)."""
    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine,
    )

    cfg = DetectorConfig().with_threshold(0.55)
    scfg = ServerConfig(max_streams=4, max_batch=4, batch_timeout_ms=2.0,
                        min_request_interval=0.0, device_detect=True)
    eng_bgr = MultiStreamEngine(cfg, scfg, ssd_net=synth_ssd_wire.net)
    eng_wire = MultiStreamEngine(
        cfg, dataclasses.replace(scfg, ingest_plane=plane),
        ssd_net=synth_ssd_wire.net)
    assert eng_wire._wire_steps is not None

    frames = [_synth_frame(seed=s) for s in range(3)]
    datas = [_encode(f) for f in frames]
    offsize = _encode(_synth_frame(464, 624, seed=7))   # wire-ineligible

    try:
        for i, d in enumerate(datas + [offsize]):
            a = eng_bgr.analyze_jpeg(d, "s0")
            b = eng_wire.analyze_jpeg(d, "s0")
            for k in ("analysis_mode", "faces_detected", "confidence_level",
                      "frame_count"):
                assert a[k] == b[k], (i, k, a, b)
            for k in ("fake_probability", "frame_forensic_probability",
                      "temporal_average", "stability_score"):
                assert a[k] == pytest.approx(b[k], abs=1e-6), (i, k)
            assert a.get("face_bbox") == b.get("face_bbox"), (i, a, b)

        bad = eng_wire.analyze_jpeg(b"\xff\xd8garbage", "s0")
        assert bad["error"] == "Invalid image format"
        assert bad["status"] == 400
        r = eng_wire.analyze_jpeg(datas[0], "s0")
        assert r["frame_count"] == 5   # 4 good frames + this one
    finally:
        eng_bgr.shutdown()
        eng_wire.shutdown()


@pytest.fixture(scope="module")
def synth_ssd_wire(tmp_path_factory):
    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10,
    )
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )
    d = tmp_path_factory.mktemp("ssd")
    proto, cm = res10_class_ssd(str(d), seed=3, channels=(8, 16, 32, 64))
    return SSDRes10.from_caffemodel(cm, proto)
