"""Extension client-logic coverage (round-4 verdict item #6).

Two tiers:

1. Static protocol-contract tests (always run): the extension JS is parsed
   for the message types, endpoints, JSON fields, and DOM ids it uses, and
   each is checked against the counterpart surface — background switch
   cases vs content/popup senders, backend routes vs serving/server.py,
   consumed response fields vs the reference JSON schema that
   tests/test_api.py pins on the server side, overlay DOM ids vs
   overlay.html.

2. Executable harness (extension/test/harness.html): the REAL
   background.js/content.js/overlay.js run against mocked chrome.* APIs
   and recorded backend responses — start -> reset -> analyze -> overlay
   update -> stop, the 127.0.0.1 fallback, 429 handling, and the
   disconnect path. Executed here under node+jsdom when available; this
   build environment ships NO JS runtime (node/bun/chromium/deno and
   embedded engines all checked absent), so the harness tier skips and is
   part of the operator acceptance checklist (extension/test/README.md).
"""

import json
import os
import re
import shutil
import subprocess

import pytest

EXT = os.path.join(os.path.dirname(__file__), "..", "extension")


def _read(name):
    with open(os.path.join(EXT, name)) as f:
        return f.read()


# The reference /analyze response schema (backend_server.py:178-233),
# machine-pinned server-side by tests/test_api.py.
ANALYZE_FIELDS = {
    "is_deepfake", "fake_probability", "confidence_level",
    "temporal_average", "stability_score", "frame_count",
    "analysis_mode", "face_probability", "face_bbox",
    "processing_time_ms", "error", "retry_after_ms",
    # optional clip-attention mode extras (config 5)
    "clip_probability", "clip_frames",
}
HEALTH_FIELDS = {"status", "model_loaded", "device", "face_detection"}
RESET_FIELDS = {"success", "message", "error"}


def test_background_routes_every_runtime_message():
    """Every chrome.runtime.sendMessage type emitted by content.js/popup.js
    must have a case in background.js's dispatcher, and every
    tabs.sendMessage type a listener branch in content.js."""
    bg = _read("background.js")
    content = _read("content.js")
    popup = _read("popup.js")

    sent_to_bg = set(re.findall(
        r"runtime\.sendMessage\(\s*\{\s*\n?\s*type:\s*\"([^\"]+)\"",
        content + popup))
    bg_cases = set(re.findall(r"case \"([^\"]+)\"", bg))
    unrouted = sent_to_bg - bg_cases - {"detector:lastResult"}  # fire-and-forget
    assert not unrouted, f"background.js has no case for {unrouted}"

    sent_to_content = set(re.findall(
        r"tabs\.sendMessage\(\s*\w+,\s*\{\s*\n?\s*type:\s*\"([^\"]+)\"", bg))
    content_handled = set(re.findall(r"msg\.type === \"([^\"]+)\"", content))
    assert sent_to_content <= content_handled, (
        f"content.js does not handle {sent_to_content - content_handled}")


def test_endpoints_match_server_routes():
    bg = _read("background.js")
    endpoints = set(re.findall(r"\$\{[a-zA-Z]+\}(/[a-z]+)`", bg))
    assert endpoints == {"/health", "/analyze", "/reset"}
    server = open(os.path.join(
        EXT, "..", "real_time_video_deepfake_detection_tpu", "serving",
        "server.py")).read()
    for ep in endpoints:
        assert f'"{ep}"' in server or f"'{ep}'" in server, (
            f"server does not route {ep}")


def test_consumed_response_fields_are_in_schema():
    """Fields the JS reads off /analyze-/health-/reset-shaped objects must
    exist in the reference schema (anything else would read undefined)."""
    overlay = _read("overlay.js")
    popup = _read("popup.js")
    bg = _read("background.js")

    consumed = set(re.findall(r"\br\.([a-z_]+)", overlay))
    consumed |= set(re.findall(r"\bresult\.([a-z_]+)", popup))
    consumed |= set(re.findall(r"\bbody\.([a-z_]+)", bg))
    unknown = consumed - ANALYZE_FIELDS
    assert not unknown, f"extension consumes non-schema fields: {unknown}"

    health_used = set(re.findall(r"\bhealth\.([a-z_]+)", popup + bg))
    assert health_used <= HEALTH_FIELDS | {"then"}, health_used


def test_overlay_dom_ids_exist():
    overlay_js = _read("overlay.js")
    overlay_html = _read("overlay.html")
    ids = set(re.findall(r"\$\(\"([a-z-]+)\"\)", overlay_js))
    for el_id in ids:
        assert f'id="{el_id}"' in overlay_html, f"overlay.html missing #{el_id}"


def test_rate_limit_contract():
    """The 429 path: background surfaces retry_after_ms (the server sends
    it, test_api pins it); content must swallow rateLimited ticks."""
    bg = _read("background.js")
    content = _read("content.js")
    assert "retry_after_ms" in bg and "429" in bg
    assert "rateLimited" in bg and "rateLimited" in content


def test_harness_files_complete():
    """The executable harness ships all parts and wires the real scripts
    (not copies): harness.html must reference ../background.js and
    ../content.js, and the recorded /analyze body must carry the full
    required schema."""
    for f in ("harness.html", "chrome_mock.js", "fetch_mock.js", "tests.js",
              "README.md",
              "run_node.js"):
        assert os.path.exists(os.path.join(EXT, "test", f)), f
    harness = _read("test/harness.html")
    assert '"../background.js"' in harness and '"../content.js"' in harness
    recorded = _read("test/fetch_mock.js")
    for field in ("is_deepfake", "fake_probability", "confidence_level",
                  "temporal_average", "stability_score", "frame_count",
                  "analysis_mode", "processing_time_ms", "retry_after_ms"):
        assert field in recorded, f"recorded responses miss {field}"


def test_harness_executes_under_node():
    """Run the real-code harness when a JS runtime exists; skip otherwise
    (none ships in this build environment)."""
    node = shutil.which("node")
    if node is None:
        pytest.skip("no node on PATH — harness is operator-checklist tier")
    probe = subprocess.run([node, "-e", "require('jsdom')"],
                           capture_output=True, cwd=os.path.join(EXT, "test"))
    if probe.returncode != 0:
        pytest.skip("node present but jsdom not installed (npm i jsdom)")
    r = subprocess.run([node, "run_node.js"], capture_output=True, text=True,
                       cwd=os.path.join(EXT, "test"), timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    results = json.loads(r.stdout)
    assert results["failed"] == 0 and results["passed"] >= 15, results
