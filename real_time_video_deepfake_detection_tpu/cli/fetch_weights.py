"""Fetch the user-supplied detector/aligner weight artifacts.

The reference assumes the operator has downloaded the public face-detection
artifacts by hand (reference face_detection.py:19-34 prints the expected
filenames when they're absent; README.md:295 names the SSD caffemodel) and
ships a resumable dataset downloader (download_dfdc.py). This CLI closes the
same gap for the model artifacts: it pulls the canonical public files into a
weights directory, skipping anything already present (the reference
downloader's resume-by-existence UX, download_dfdc.py:95-96), retrying
transient failures with exponential backoff (download_dfdc.py:86-170
pattern), and then verifying each download STRUCTURALLY by parsing it with
this package's own loaders — a corrupt or truncated file fails loudly here
instead of at server boot.

Artifacts:
  ssd    deploy.prototxt + res10_300x300_ssd_iter_140000_fp16.caffemodel
         (OpenCV face-detector sample artifacts; serve with
         `--ssd-weights weights/res10_...caffemodel --device-detect`)
  haar   haarcascade_frontalface_default.xml (OpenCV data; the fallback
         rung — often already present via the cv2 wheel, which is checked
         first)
  mtcnn  pnet.pt / rnet.pt / onet.pt (facenet-pytorch's published weights;
         serve with `--mtcnn-weights weights/mtcnn [--mtcnn-device]`)
  effnet_b0_imagenet
         efficientnet-b0-355c32eb.pth — the ImageNet init the reference's
         model constructor downloads via EfficientNet.from_pretrained
         (reference model.py:40-41); train with `--pretrained` to start
         from it, exactly as every reference training run does
         (reference train.py:841)

Checksum note: upstream republishes some of these files (branch moves), so
instead of pinning hashes that rot, verification parses the bytes with the
same code that will consume them (utils/caffe_convert, utils/prototxt,
models/haar_cascade, models/mtcnn). `--sha256 name=hexdigest` adds a strict
pin when the operator wants one.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import time
import urllib.error
import urllib.request


def _verify_prototxt(path: str) -> str:
    from ..utils.prototxt import as_list, load_prototxt
    net = load_prototxt(path)
    layers = as_list(net.get("layer", []))
    if not layers:
        raise ValueError("no layers parsed")
    return f"{len(layers)} layers"


def _verify_caffemodel(path: str) -> str:
    from ..utils.caffe_convert import load_caffemodel
    blobs = load_caffemodel(path)
    if not blobs:
        raise ValueError("no weight blobs parsed")
    n = sum(len(v) for v in blobs.values())
    return f"{len(blobs)} layers / {n} blobs"


def _verify_haar_xml(path: str) -> str:
    from ..models.haar_cascade import HaarCascade
    c = HaarCascade.from_xml(path)
    return f"{len(c.stages)} stages, {c.win_w}x{c.win_h} window"


def _verify_mtcnn_pt(net: str):
    def check(path: str) -> str:
        import jax
        import torch
        from ..models.mtcnn import convert_facenet_state_dict
        # weights_only=True: facenet's pnet/rnet/onet .pt files are plain
        # tensor state dicts, so verification never unpickles arbitrary
        # objects from a just-downloaded file.
        sd = torch.load(path, map_location="cpu", weights_only=True)
        params = convert_facenet_state_dict(
            {k: v.numpy() for k, v in sd.items()}, net)
        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
        return f"{net}: {n} params"
    return check


def _verify_effnet_imagenet(path: str) -> str:
    """Parse a bare efficientnet_pytorch/timm ImageNet checkpoint with the
    converter that the trainer's --pretrained path will use."""
    import jax
    import torch
    from ..models.efficientnet import EfficientNetSpec
    from ..utils.torch_convert import convert_imagenet_state_dict
    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = convert_imagenet_state_dict(
        {k: v.numpy() for k, v in sd.items()}, EfficientNetSpec.make("b0"),
        jax.random.PRNGKey(0))
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    return f"b0 imagenet backbone + fresh head: {n} params"


_OPENCV_RAW = "https://raw.githubusercontent.com/opencv/opencv/4.x"
_OPENCV_3RD = ("https://raw.githubusercontent.com/opencv/opencv_3rdparty/"
               "dnn_samples_face_detector_20180205_fp16")
_FACENET_RAW = "https://raw.githubusercontent.com/timesler/facenet-pytorch/master"
_EFFNET_REL = ("https://github.com/lukemelas/EfficientNet-PyTorch/releases/"
               "download/1.0")

# name -> list of (filename, url, verifier)
ARTIFACTS = {
    "ssd": [
        ("deploy.prototxt",
         f"{_OPENCV_RAW}/samples/dnn/face_detector/deploy.prototxt",
         _verify_prototxt),
        ("res10_300x300_ssd_iter_140000_fp16.caffemodel",
         f"{_OPENCV_3RD}/res10_300x300_ssd_iter_140000_fp16.caffemodel",
         _verify_caffemodel),
    ],
    "haar": [
        ("haarcascade_frontalface_default.xml",
         f"{_OPENCV_RAW}/data/haarcascades/haarcascade_frontalface_default.xml",
         _verify_haar_xml),
    ],
    "mtcnn": [
        (os.path.join("mtcnn", f"{net}.pt"),
         f"{_FACENET_RAW}/data/{net}.pt",
         _verify_mtcnn_pt(net))
        for net in ("pnet", "rnet", "onet")
    ],
    # The ImageNet-pretrained B0 the reference's constructor requires
    # (reference model.py:40-41 EfficientNet.from_pretrained): the
    # efficientnet_pytorch release artifact. The torch-hub filename suffix
    # (355c32eb) is the leading 8 hex chars of the file's sha256, which the
    # fetcher checks as a built-in pin.
    "effnet_b0_imagenet": [
        ("efficientnet-b0-355c32eb.pth",
         f"{_EFFNET_REL}/efficientnet-b0-355c32eb.pth",
         _verify_effnet_imagenet),
    ],
}

# torch-hub naming convention: <name>-<sha256[:8]>.<ext>. Checked on every
# fetch AND on resume-by-existence, so a stale/corrupt present file cannot
# report success.
_BUILTIN_SHA256_PREFIX = {
    "efficientnet-b0-355c32eb.pth": "355c32eb",
}


def download(url: str, dest: str, retries: int = 4,
             timeout: float = 60.0) -> None:
    """Stream `url` to `dest` atomically (tmp+rename), exponential backoff
    on transient failures (the download_dfdc.py retry ladder, capped)."""
    tmp = dest + ".part"
    delay = 5.0
    for attempt in range(retries):
        try:
            req = urllib.request.Request(
                url, headers={"User-Agent": "rtvdd-fetch-weights"})
            with urllib.request.urlopen(req, timeout=timeout) as r, \
                    open(tmp, "wb") as f:
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
            os.replace(tmp, dest)
            return
        except (urllib.error.URLError, OSError) as e:
            if os.path.exists(tmp):
                os.remove(tmp)
            if attempt == retries - 1:
                raise
            print(f"  retry {attempt + 1}/{retries - 1} in {delay:.0f}s "
                  f"({e})", flush=True)
            time.sleep(delay)
            delay = min(delay * 2, 300.0)


def _check_file(dest: str, fname: str, verify, want: str | None) -> str:
    """Pin-check (full sha256 or torch-hub 8-hex prefix) then structurally
    verify `dest`. Returns the verifier's detail string; raises on mismatch."""
    base = os.path.basename(fname)
    digest = None
    if want or base in _BUILTIN_SHA256_PREFIX:
        with open(dest, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
    if want and digest != want:
        raise ValueError(f"sha256 {digest} != pinned {want}")
    prefix = _BUILTIN_SHA256_PREFIX.get(base)
    if prefix and not digest.startswith(prefix):
        raise ValueError(
            f"sha256 {digest[:8]}... != torch-hub filename prefix {prefix}")
    return verify(dest)


def fetch(names, dest_dir: str, force: bool = False, dry_run: bool = False,
          sha256: dict | None = None) -> int:
    """Fetch + verify the named artifact groups. Returns count of failures.

    Already-present files are NOT trusted: they re-run the pin check and the
    structural verifier (so `--sha256` pins apply to resumed runs too), and
    only re-download on --force."""
    sha256 = sha256 or {}
    failures = 0
    for name in names:
        for fname, url, verify in ARTIFACTS[name]:
            dest = os.path.join(dest_dir, fname)
            if os.path.exists(dest) and not force:
                if dry_run:
                    # a dry run only LISTS planned work — it must not hash
                    # 20MB+ files or import jax/torch for the structural
                    # verifiers, and must never report failures
                    print(f"[dry-run] {fname} present; a real run would "
                          f"verify it (pin + structural parse)")
                    continue
                try:
                    detail = _check_file(dest, fname,
                                         verify, sha256.get(os.path.basename(fname)))
                    print(f"[ok] {fname} already present, verified ({detail})")
                except Exception as e:
                    print(f"[FAIL] {fname}: present but failed verification "
                          f"({type(e).__name__}: {e}); re-run with --force "
                          f"to replace")
                    failures += 1
                continue
            if name == "haar" and not force:
                # the cv2 wheel usually ships this file already
                try:
                    import cv2
                    shipped = os.path.join(cv2.data.haarcascades,
                                           os.path.basename(fname))
                    if os.path.exists(shipped):
                        print(f"[skip] {fname}: cv2 ships it at {shipped}")
                        continue
                except Exception:
                    pass
            if dry_run:
                print(f"[dry-run] would fetch {url} -> {dest}")
                continue
            os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
            print(f"[fetch] {url}")
            try:
                download(url, dest)
            except Exception as e:
                print(f"[FAIL] {fname}: download failed: {e}")
                failures += 1
                continue
            try:
                detail = _check_file(dest, fname,
                                     verify, sha256.get(os.path.basename(fname)))
            except Exception as e:
                print(f"[FAIL] {fname}: downloaded but failed verification "
                      f"({type(e).__name__}: {e}); removing")
                os.remove(dest)
                failures += 1
                continue
            print(f"[ok] {fname} ({detail})")
    return failures


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Download the public detector/aligner weight artifacts")
    p.add_argument("--dest", default="weights",
                   help="destination directory (default: ./weights, the "
                        "reference's layout)")
    p.add_argument("--only", nargs="*", choices=sorted(ARTIFACTS),
                   default=sorted(ARTIFACTS),
                   help="artifact groups to fetch (default: all)")
    p.add_argument("--force", action="store_true",
                   help="re-download even if present")
    p.add_argument("--dry-run", action="store_true",
                   help="print what would be fetched, touch nothing")
    p.add_argument("--list", action="store_true", dest="list_only",
                   help="list artifacts and exit")
    p.add_argument("--sha256", nargs="*", default=[], metavar="FILE=HEX",
                   help="optional strict pins, e.g. "
                        "deploy.prototxt=ab12...")
    args = p.parse_args(argv)

    if args.list_only:
        for name in sorted(ARTIFACTS):
            for fname, url, _ in ARTIFACTS[name]:
                print(f"{name:6} {fname:55} {url}")
        return

    pins = {}
    for spec in args.sha256:
        if "=" not in spec:
            sys.exit(f"--sha256 expects FILE=HEX, got {spec!r}")
        k, v = spec.split("=", 1)
        pins[k] = v.lower()

    failures = fetch(args.only, args.dest, force=args.force,
                     dry_run=args.dry_run, sha256=pins)
    if failures:
        sys.exit(f"{failures} artifact(s) failed")


if __name__ == "__main__":
    main()
