"""rtvdd-fetch-weights: the weight-artifact downloader (the reference
assumes hand-downloaded files, face_detection.py:19-34; this CLI automates
it with the download_dfdc.py retry/resume UX). Network is not available in
CI, so these tests drive the structural verifiers on locally generated
artifacts and the skip/dry-run/pin logic with a stubbed downloader."""

import hashlib
import io
import os
import contextlib

import numpy as np
import pytest

from real_time_video_deepfake_detection_tpu.cli import fetch_weights as fw


def test_list_and_dry_run(capsys, tmp_path):
    fw.main(["--list"])
    out = capsys.readouterr().out
    assert "res10_300x300_ssd_iter_140000_fp16.caffemodel" in out
    assert "deploy.prototxt" in out
    assert "pnet.pt" in out

    fw.main(["--dest", str(tmp_path), "--only", "ssd", "--dry-run"])
    out = capsys.readouterr().out
    assert "would fetch" in out
    assert not os.path.exists(tmp_path / "deploy.prototxt")


def test_verifiers_accept_real_format_artifacts(tmp_path):
    """The structural verifiers parse artifacts in the genuine formats:
    the synthetic res10-class caffemodel/prototxt (utils/ssd_synth writes
    real protobuf/prototxt bytes) and cv2's shipped Haar XML."""
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )
    proto, cm = res10_class_ssd(str(tmp_path / "ssd"), seed=0)
    assert "layers" in fw._verify_prototxt(proto)
    assert "blobs" in fw._verify_caffemodel(cm)

    cv2 = pytest.importorskip("cv2")
    xml = os.path.join(cv2.data.haarcascades,
                       "haarcascade_frontalface_default.xml")
    if not os.path.exists(xml):
        pytest.skip("cv2 wheel ships no haarcascades")
    assert "stages" in fw._verify_haar_xml(xml)


def test_verifiers_reject_garbage(tmp_path):
    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01garbage" * 100)
    for v in (fw._verify_prototxt, fw._verify_caffemodel,
              fw._verify_haar_xml, fw._verify_mtcnn_pt("pnet")):
        with pytest.raises(Exception):
            v(bad)


def test_fetch_skip_existing_verify_and_pin(tmp_path, monkeypatch, capsys):
    """fetch(): resume-by-existence skips present files; a stubbed download
    that produces a parseable artifact passes verification; a wrong sha256
    pin deletes the file and counts a failure."""
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )
    proto_src, _ = res10_class_ssd(str(tmp_path / "src"), seed=0)
    payload = open(proto_src, "rb").read()

    calls = []

    def fake_download(url, dest, retries=4, timeout=60.0):
        calls.append(url)
        with open(dest, "wb") as f:
            f.write(payload)

    monkeypatch.setattr(fw, "download", fake_download)
    monkeypatch.setitem(
        fw.ARTIFACTS, "ssd",
        [("deploy.prototxt", "http://example/deploy.prototxt",
          fw._verify_prototxt)])

    dest = str(tmp_path / "w")
    assert fw.fetch(["ssd"], dest) == 0
    assert len(calls) == 1
    assert os.path.exists(os.path.join(dest, "deploy.prototxt"))

    # second run: resume-by-existence — no new download, but the present
    # file is re-verified rather than blindly trusted (round-3 advisor)
    assert fw.fetch(["ssd"], dest) == 0
    assert len(calls) == 1
    assert "already present, verified" in capsys.readouterr().out

    # wrong pin -> failure + file removed
    assert fw.fetch(["ssd"], dest, force=True,
                    sha256={"deploy.prototxt": "0" * 64}) == 1
    assert not os.path.exists(os.path.join(dest, "deploy.prototxt"))

    # right pin -> ok
    good = hashlib.sha256(payload).hexdigest()
    assert fw.fetch(["ssd"], dest, sha256={"deploy.prototxt": good}) == 0


def test_fetch_removes_unparseable_download(tmp_path, monkeypatch):
    def fake_download(url, dest, retries=4, timeout=60.0):
        with open(dest, "wb") as f:
            f.write(b"not a prototxt at all {{{")

    monkeypatch.setattr(fw, "download", fake_download)
    monkeypatch.setitem(
        fw.ARTIFACTS, "ssd",
        [("deploy.prototxt", "http://example/deploy.prototxt",
          fw._verify_prototxt)])
    dest = str(tmp_path / "w")
    assert fw.fetch(["ssd"], dest) == 1
    assert not os.path.exists(os.path.join(dest, "deploy.prototxt"))


def test_mtcnn_verifier_roundtrip(tmp_path):
    """A facenet-schema PNet state dict saved with torch verifies."""
    torch = pytest.importorskip("torch")

    sd = {
        "conv1.weight": torch.randn(10, 3, 3, 3),
        "conv1.bias": torch.randn(10),
        "prelu1.weight": torch.randn(10),
        "conv2.weight": torch.randn(16, 10, 3, 3),
        "conv2.bias": torch.randn(16),
        "prelu2.weight": torch.randn(16),
        "conv3.weight": torch.randn(32, 16, 3, 3),
        "conv3.bias": torch.randn(32),
        "prelu3.weight": torch.randn(32),
        "conv4_1.weight": torch.randn(2, 32, 1, 1),
        "conv4_1.bias": torch.randn(2),
        "conv4_2.weight": torch.randn(4, 32, 1, 1),
        "conv4_2.bias": torch.randn(4),
    }
    path = str(tmp_path / "pnet.pt")
    torch.save(sd, path)
    assert "pnet" in fw._verify_mtcnn_pt("pnet")(path)


def test_dry_run_with_present_files_stays_dry(tmp_path, capsys):
    """--dry-run must only LIST planned work: with artifacts already present
    it neither hashes them nor runs structural verifiers, and a corrupt
    present file cannot make a dry run report failures."""
    from real_time_video_deepfake_detection_tpu.cli import fetch_weights as fw

    (tmp_path / "deploy.prototxt").write_bytes(b"garbage that would FAIL "
                                               b"the structural verifier")
    failures = fw.fetch(["ssd"], str(tmp_path), dry_run=True)
    out = capsys.readouterr().out
    assert failures == 0
    assert "[FAIL]" not in out
    assert "[dry-run]" in out
