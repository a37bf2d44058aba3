"""Native C++ ingest data-plane tests: bit-exactness vs cv2 for JPEG decode
and INTER_LINEAR resize, batch API, failure handling. Skipped when the
toolchain/libjpeg is unavailable."""

import numpy as np
import pytest
import cv2

from real_time_video_deepfake_detection_tpu.utils import native_ingest as ni

pytestmark = pytest.mark.skipif(ni.get_lib() is None,
                                reason="native ingest unavailable")

rng = np.random.default_rng(101)


def _jpeg_bytes(img, q=85):
    ok, enc = cv2.imencode(".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), q])
    return enc.tobytes()


def test_decode_bit_exact_vs_cv2():
    for shape in [(480, 640), (123, 217), (720, 1280)]:
        img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        data = _jpeg_bytes(img)
        ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        got = ni.decode_jpeg(data)
        np.testing.assert_array_equal(got, ref)


def test_decode_resize_bit_exact():
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    data = _jpeg_bytes(img)
    ref = cv2.resize(cv2.imdecode(np.frombuffer(data, np.uint8),
                                  cv2.IMREAD_COLOR),
                     (256, 256), interpolation=cv2.INTER_LINEAR)
    got = ni.decode_resize(data, 256, 256)
    np.testing.assert_array_equal(got, ref)


def test_resize_only_bit_exact():
    for shape in [(480, 640), (512, 512), (300, 400)]:
        img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        ref = cv2.resize(img, (256, 256), interpolation=cv2.INTER_LINEAR)
        got = ni.resize_u8(img, 256, 256)
        np.testing.assert_array_equal(got, ref)


def test_batch_decode():
    # downscale-only (upscale axes have a documented ±1 LSB vs cv2)
    imgs = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(8)]
    datas = [_jpeg_bytes(im) for im in imgs]
    datas[3] = b"not a jpeg"
    out, ok = ni.decode_resize_batch(datas, 256, 256, n_threads=4)
    assert ok.sum() == 7 and not ok[3]
    ref = cv2.resize(cv2.imdecode(np.frombuffer(datas[0], np.uint8),
                                  cv2.IMREAD_COLOR), (256, 256))
    np.testing.assert_array_equal(out[0], ref)


def test_batch_decode_fast_scaled():
    """fast=True (DCT-scaled decode, ServerConfig.ingest_scaled_decode):
    output must be close to the exact full-decode pipeline (documented
    deviation, docs/DESIGN.md) and still catch corrupt members. On a
    1280x720 capture -> 480x640 the scaled decode stays >= 2x target."""
    imgs = [rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
            for _ in range(4)]
    # natural-ish content compresses/round-trips more stably than noise
    imgs = [cv2.GaussianBlur(im, (0, 0), 3) for im in imgs]
    datas = [_jpeg_bytes(im) for im in imgs]
    datas[2] = b"corrupt"
    fast, okf = ni.decode_resize_batch(datas, 480, 640, n_threads=1,
                                       fast=True)
    exact, oke = ni.decode_resize_batch(datas, 480, 640, n_threads=1)
    assert okf.sum() == 3 and not okf[2]
    assert np.array_equal(okf, oke)
    for i in (0, 1, 3):
        d = np.abs(fast[i].astype(int) - exact[i].astype(int))
        assert d.mean() < 2.0 and np.percentile(d, 99) <= 12, (
            i, d.mean(), np.percentile(d, 99))


def test_garbage_returns_none():
    assert ni.decode_jpeg(b"garbage") is None
    assert ni.decode_resize(b"") is None


def test_decode_rejects_absurd_header_dimensions():
    """A crafted JPEG whose SOF0 header declares 60000x60000 (~10.8 GB BGR)
    must be rejected cleanly (None), not crash: the decoder used to pass the
    unchecked dimensions to malloc and write scanlines through a null
    return. The serving ladder then falls back to cv2 / the 400 path."""
    from real_time_video_deepfake_detection_tpu.utils import native_ingest

    if native_ingest.get_lib() is None:
        pytest.skip("native ingest unavailable")

    ok, enc = cv2.imencode(
        ".jpg", np.full((32, 32, 3), 128, np.uint8))
    assert ok
    raw = bytearray(enc.tobytes())
    # patch SOF0/SOF2 height/width fields (big-endian u16 at offset +5/+7)
    i = 0
    patched = False
    while i < len(raw) - 1:
        if raw[i] == 0xFF and raw[i + 1] in (0xC0, 0xC2):
            raw[i + 5:i + 7] = (60000).to_bytes(2, "big")
            raw[i + 7:i + 9] = (60000).to_bytes(2, "big")
            patched = True
            break
        i += 1
    assert patched
    assert native_ingest.decode_jpeg(bytes(raw)) is None
    # and the normal image still decodes
    out = native_ingest.decode_jpeg(enc.tobytes())
    assert out is not None and out.shape == (32, 32, 3)
