"""HTTP API contract tests (reference tests/test_functional.py:356-424 and
tests/test_reliability.py patterns, via the in-process test client)."""

import io
import time

import numpy as np
import pytest
import cv2

from real_time_video_deepfake_detection_tpu.core.config import (
    DetectorConfig, ServerConfig,
)
from real_time_video_deepfake_detection_tpu.pipeline.detector import DeepfakeDetector
from real_time_video_deepfake_detection_tpu.serving.server import create_app

rng = np.random.default_rng(11)


@pytest.fixture(scope="module")
def app():
    det = DeepfakeDetector(DetectorConfig().with_threshold(0.55))
    return create_app(det)


@pytest.fixture()
def client(app):
    app.detector.reset()
    time.sleep(0.11)  # clear the rate-limit window between tests
    return app.test_client()


def generate_face_frame(w=640, h=480):
    """Synthetic frame with a face-like ellipse (reference
    tests/test_functional.py:24-34)."""
    frame = np.full((h, w, 3), 128, np.uint8)
    cv2.ellipse(frame, (w // 2, h // 2), (80, 110), 0, 0, 360,
                (190, 210, 230), -1)
    cv2.circle(frame, (w // 2 - 30, h // 2 - 30), 10, (40, 40, 40), -1)
    cv2.circle(frame, (w // 2 + 30, h // 2 - 30), 10, (40, 40, 40), -1)
    cv2.ellipse(frame, (w // 2, h // 2 + 40), (25, 12), 0, 0, 180, (60, 70, 90), 3)
    return frame


def _jpeg(frame):
    ok, enc = cv2.imencode(".jpg", frame)
    assert ok
    return io.BytesIO(enc.tobytes())


def test_health_schema(client):
    r = client.get("/health")
    assert r.status_code == 200
    j = r.get_json()
    assert j["status"] == "healthy"
    for k in ["model_loaded", "device", "gpu_name", "frame_count", "capabilities"]:
        assert k in j
    assert j["capabilities"] == {"face_detection": True,
                                 "frame_forensics": True,
                                 "temporal_tracking": True}


def test_analyze_frame_only_schema(client):
    frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    r = client.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
    assert r.status_code == 200
    j = r.get_json()
    assert j["success"] is True
    assert j["analysis_mode"] == "frame_only"
    for k in ["faces_detected", "fake_probability", "frame_forensic_probability",
              "real_probability", "confidence_level", "temporal_average",
              "stability_score", "frame_count", "processing_time_ms"]:
        assert k in j, k
    assert 0.0 <= j["fake_probability"] <= 1.0
    assert abs(j["real_probability"] - (1 - j["fake_probability"])) < 1e-6
    assert j["confidence_level"] == "UNCERTAIN"  # first frame
    assert j["frame_count"] == 1


def test_analyze_face_schema_when_face_found(client):
    frame = generate_face_frame()
    r = client.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
    assert r.status_code == 200
    j = r.get_json()
    if j["analysis_mode"] == "face+frame":   # Haar may or may not fire on synthetic
        assert "face_probability" in j
        bbox = j["face_bbox"]
        assert set(bbox.keys()) == {"x", "y", "width", "height"}
        assert j["faces_detected"] >= 1


def test_error_no_frame(client):
    r = client.post("/analyze", data={})
    assert r.status_code == 400
    assert r.get_json() == {"error": "No frame provided"}


def test_error_bad_image(client):
    r = client.post("/analyze", data={"frame": (io.BytesIO(b"not an image"), "f.jpg")})
    assert r.status_code == 400
    assert r.get_json() == {"error": "Invalid image format"}


def test_rate_limit_429():
    # Dedicated app with a long window so the second request deterministically
    # trips the limiter regardless of processing time.
    det = DeepfakeDetector(DetectorConfig().with_threshold(0.55))
    app2 = create_app(det, ServerConfig(min_request_interval=10.0))
    c = app2.test_client()
    frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    r0 = c.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
    assert r0.status_code == 200
    r = c.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
    assert r.status_code == 429
    j = r.get_json()
    assert j["error"] == "Rate limited"
    assert 0 <= j["retry_after_ms"] <= 10000


def test_rate_limit_spaced_requests_pass(client):
    frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    for _ in range(3):
        r = client.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
        assert r.status_code == 200
        time.sleep(0.11)


def test_reset_and_stats(client):
    frame = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    for _ in range(3):
        client.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
        time.sleep(0.11)
    r = client.get("/stats")
    j = r.get_json()
    assert j["frame_count"] == 3
    assert j["voting"]["total_frames"] == 3
    r = client.post("/reset")
    assert r.get_json() == {"success": True, "message": "Detector reset successfully"}
    j = client.get("/stats").get_json()
    assert j["frame_count"] == 0
    assert j["history_length"] == 0
    assert j["confidence_level"] == "UNCERTAIN"


def test_png_and_bmp_accepted(client):
    frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    for ext in [".png", ".bmp"]:
        ok, enc = cv2.imencode(ext, frame)
        r = client.post("/analyze",
                        data={"frame": (io.BytesIO(enc.tobytes()), "f" + ext)})
        assert r.status_code == 200, ext
        time.sleep(0.11)


def test_resolution_sweep(client):
    for (h, w) in [(120, 160), (240, 320), (480, 640), (720, 1280), (1080, 1920)]:
        frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        r = client.post("/analyze", data={"frame": (_jpeg(frame), "f.jpg")})
        assert r.status_code == 200, (h, w)
        time.sleep(0.11)


def test_unknown_route_and_method(client):
    assert client.get("/nope").status_code == 404
    assert client.get("/analyze").status_code == 405


def test_cli_flag_validation_exits():
    """--device-detect / --mtcnn-device misconfigurations fail fast at the
    CLI instead of surfacing deep in engine construction."""
    from real_time_video_deepfake_detection_tpu.serving.server import main
    for argv, want in [
        (["--device-detect"], "--batched"),
        (["--device-detect", "--batched"], "--ssd-weights"),
        (["--mtcnn-device"], "--device-detect"),
        # the fused tick always detects with the in-tick SSD: a pinned
        # non-SSD rung cannot be honored and must be rejected loudly, not
        # silently overridden
        (["--device-detect", "--batched", "--ssd-weights", "x.caffemodel",
          "--face-backend", "haar"], "cannot honor"),
        (["--device-detect", "--batched", "--ssd-weights", "x.caffemodel",
          "--face-backend", "heuristic"], "cannot honor"),
    ]:
        with pytest.raises(SystemExit, match=want.replace("-", "[-]")):
            main(argv)


def test_multipart_payload_bytes_exact():
    """The multipart parser must hand back file payloads byte-for-byte:
    payloads whose OWN trailing bytes are \r / \n previously lost them to a
    strip(b"\r\n") (corrupting e.g. BMPs whose last pixel bytes are
    0x0A/0x0D). RFC 2046: a part ends at the CRLF belonging to the next
    boundary line — nothing else is protocol."""
    from real_time_video_deepfake_detection_tpu.serving.wsgi import Request

    payloads = [b"\r\nstarts and ends with newlines\r\n", b"x\n", b"\r",
                b"\n\n\n", b"plain", b"\x89PNG\r\n\x1a\nDATA\n"]
    for i, payload in enumerate(payloads):
        boundary = "bnd417"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="frame"; filename="f.bin"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        environ = {
            "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
            "CONTENT_TYPE": f"multipart/form-data; boundary={boundary}",
            "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        }
        req = Request(environ)
        assert req.files["frame"] == payload, (i, payload, req.files["frame"])

    # bare-LF generator (tolerated, like werkzeug)
    boundary = "bnd417"
    payload = b"tail\n"
    body = (
        f"--{boundary}\n"
        'Content-Disposition: form-data; name="frame"; filename="f.bin"\n\n'
    ).encode() + payload + f"\n--{boundary}--\n".encode()
    req = Request({
        "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
        "CONTENT_TYPE": f"multipart/form-data; boundary={boundary}",
        "CONTENT_LENGTH": str(len(body)), "wsgi.input": io.BytesIO(body),
    })
    assert req.files["frame"] == payload


def test_bmp_with_trailing_newline_bytes_accepted(client):
    """End-to-end: a BMP whose final pixel bytes are newline-valued decodes
    and analyzes fine (reference accepts BMP, test_reliability.py:162-192)."""
    frame = np.full((16, 16, 3), 77, np.uint8)
    frame[0, -1] = (13, 10, 13)   # BMP rows are bottom-up: row 0 is LAST
    ok, enc = cv2.imencode(".bmp", frame)
    assert ok
    raw = enc.tobytes()
    assert raw.endswith((b"\n", b"\r"))  # the regression-triggering shape
    r = client.post("/analyze", data={"frame": (io.BytesIO(raw), "f.bmp")})
    assert r.status_code == 200
    assert r.get_json()["success"] is True


def test_multipart_malformed_bodies_never_raise():
    """Adversarial multipart structures parse to an empty/partial file set —
    never an exception (Request construction runs OUTSIDE the dispatch
    try/except, so a parser crash would take down the connection, not
    return a 400 like the reference's Flask does)."""
    from real_time_video_deepfake_detection_tpu.serving.wsgi import Request

    b = "bnd417"
    ct = f"multipart/form-data; boundary={b}"
    head = ('Content-Disposition: form-data; name="frame"; '
            'filename="f.bin"\r\n\r\n')
    cases = [
        # no boundary parameter at all
        ("multipart/form-data", b"--x\r\njunk"),
        # boundary never appears in the body
        (ct, b"complete garbage, no delimiter"),
        # opening delimiter, then truncation before any headers
        (ct, f"--{b}\r\n".encode()),
        # part with headers but no blank-line separator, then EOF
        (ct, f"--{b}\r\nContent-Disposition: form-data".encode()),
        # part missing the name attribute entirely
        (ct, (f"--{b}\r\nContent-Disposition: form-data\r\n\r\npayload"
              f"\r\n--{b}--\r\n").encode()),
        # no closing delimiter after a complete part
        (ct, (f"--{b}\r\n" + head).encode() + b"payload"),
        # closing delimiter immediately (zero parts)
        (ct, f"--{b}--\r\n".encode()),
        # quoted boundary parameter (RFC 2046 allows it)
        (f'multipart/form-data; boundary="{b}"',
         (f"--{b}\r\n" + head).encode() + b"P" + f"\r\n--{b}--\r\n".encode()),
        # empty body despite multipart content type
        (ct, b""),
    ]
    for i, (ctype, body) in enumerate(cases):
        req = Request({
            "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
            "CONTENT_TYPE": ctype, "CONTENT_LENGTH": str(len(body)),
            "wsgi.input": io.BytesIO(body),
        })
        assert isinstance(req.files, dict), i

    # the quoted-boundary case must also actually parse its payload
    req = Request({
        "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
        "CONTENT_TYPE": f'multipart/form-data; boundary="{b}"',
        "CONTENT_LENGTH": str(len((f"--{b}\r\n" + head).encode() + b"P"
                                  + f"\r\n--{b}--\r\n".encode())),
        "wsgi.input": io.BytesIO((f"--{b}\r\n" + head).encode() + b"P"
                                 + f"\r\n--{b}--\r\n".encode()),
    })
    assert req.files["frame"] == b"P"


def test_negative_or_garbage_content_length_reads_nothing():
    """Content-Length: -5 must not become read(-5) (read-to-EOF blocks a
    keep-alive socket until the client hangs up); garbage falls back to 0."""
    from real_time_video_deepfake_detection_tpu.serving.wsgi import Request

    class EOFBlockingStream(io.BytesIO):
        def read(self, n=-1):
            assert n is not None and n >= 0, "read-to-EOF on request body"
            return super().read(n)

    for cl in ("-5", "-1", "banana", ""):
        req = Request({
            "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
            "CONTENT_TYPE": "application/json", "CONTENT_LENGTH": cl,
            "wsgi.input": EOFBlockingStream(b"leftover bytes"),
        })
        assert req.body == b"", cl


def test_multipart_quoted_boundary_with_comma():
    """RFC 2046 bchars include ',' — a quoted boundary="xy,z" must parse
    (the old [^\";,]+ capture truncated it to 'xy' and the request lost its
    file, 400ing a valid /analyze)."""
    from real_time_video_deepfake_detection_tpu.serving.wsgi import Request

    payload = b"FRAMEBYTES"
    boundary = "xy,z:q=7"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="frame"; filename="f.jpg"\r\n'
        "Content-Type: image/jpeg\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    environ = {
        "REQUEST_METHOD": "POST", "PATH_INFO": "/analyze",
        "CONTENT_TYPE": f'multipart/form-data; boundary="{boundary}"',
        "CONTENT_LENGTH": str(len(body)),
        "wsgi.input": io.BytesIO(body),
    }
    req = Request(environ)
    assert req.files["frame"] == payload
