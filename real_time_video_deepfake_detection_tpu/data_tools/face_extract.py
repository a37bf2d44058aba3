"""Face-crop pre-extraction from videos (reference train.py:100-276).

Videos in <videos>/{real,fake}/*.mp4 -> balanced 1:1 face-crop JPEGs in
<output>/{train,val}/{real,fake}/, with random frame sampling in the 5-95%
span, largest-face selection with 30% margin, minimum crop size, and a
deterministic 15% validation split.

Uses the framework's FaceDetector (SSD-on-JAX when weights exist, Haar
fallback) instead of raw Haar — one detector implementation everywhere.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np

FACE_MARGIN = 0.3
MIN_FACE_SIZE = 80
VAL_SPLIT = 0.15
SEED = 42


def largest_face_with_margin(frame, detector, min_size: int = 60):
    faces = [f for f in detector(frame) if f[2] >= min_size and f[3] >= min_size]
    if not faces:
        return None
    x, y, w, h = max(faces, key=lambda f: f[2] * f[3])
    mx, my = int(w * FACE_MARGIN), int(h * FACE_MARGIN)
    fh, fw = frame.shape[:2]
    x1, y1 = max(0, x - mx), max(0, y - my)
    x2, y2 = min(fw, x + w + mx), min(fh, y + h + my)
    return (x1, y1, x2 - x1, y2 - y1)


def extract_crops(video_path: str, detector, rng: random.Random,
                  max_frames: int = 15, size: int = 224):
    import cv2
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return []
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        cap.release()
        return []
    start, end = int(total * 0.05), int(total * 0.95)
    if end <= start:
        start, end = 0, total - 1
    n_cand = min(max_frames * 3, end - start + 1)
    candidates = sorted(rng.sample(range(start, end + 1), n_cand))
    crops = []
    for idx in candidates:
        if len(crops) >= max_frames:
            break
        cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
        ret, frame = cap.read()
        if not ret or frame is None:
            continue
        box = largest_face_with_margin(frame, detector)
        if box is None:
            continue
        x, y, w, h = box
        crop = frame[y:y + h, x:x + w]
        if crop.shape[0] < MIN_FACE_SIZE or crop.shape[1] < MIN_FACE_SIZE:
            continue
        crops.append(cv2.resize(crop, (size, size), interpolation=cv2.INTER_AREA))
    cap.release()
    return crops


def preextract(videos_dir: str, output_dir: str, frames_per_video: int = 15,
               size: int = 224, ssd_weights: str | None = None) -> dict:
    import cv2
    from ..pipeline.faces import FaceDetector

    detector = FaceDetector(ssd_weights_path=ssd_weights)
    rng = random.Random(SEED)
    out = Path(output_dir)
    stats = {"real": 0, "fake": 0}

    for label in ("real", "fake"):
        vids = sorted((Path(videos_dir) / label).glob("*.mp4"))
        rng.shuffle(vids)
        n_val = int(len(vids) * VAL_SPLIT)
        splits = [("val", vids[:n_val]), ("train", vids[n_val:])]
        for split, split_vids in splits:
            d = out / split / label
            d.mkdir(parents=True, exist_ok=True)
            for v in split_vids:
                marker = d / f"{v.stem}_0.jpg"
                if marker.exists():   # resume-by-existence
                    continue
                for i, crop in enumerate(
                        extract_crops(str(v), detector, rng,
                                      frames_per_video, size)):
                    cv2.imwrite(str(d / f"{v.stem}_{i}.jpg"), crop,
                                [int(cv2.IMWRITE_JPEG_QUALITY), 95])
                    stats[label] += 1

    # balance 1:1 by deleting surplus from the larger TRAIN class
    for split in ("train",):
        counts = {l: len(list((out / split / l).glob("*.jpg")))
                  for l in ("real", "fake")}
        smaller = min(counts.values())
        for l in ("real", "fake"):
            files = sorted((out / split / l).glob("*.jpg"))
            rng.shuffle(files)
            for f in files[smaller:]:
                f.unlink()
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description="Pre-extract balanced face crops")
    p.add_argument("--videos", required=True, help="dir with real/ fake/ mp4s")
    p.add_argument("--output", required=True)
    p.add_argument("--frames-per-video", type=int, default=15)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--ssd-weights", default=None)
    args = p.parse_args(argv)
    stats = preextract(args.videos, args.output, args.frames_per_video,
                       args.size, args.ssd_weights)
    print(stats)


if __name__ == "__main__":
    main()
