"""Offline/webcam analysis CLI — the library `predict` loop (reference
deepfake_detection.py:588-686 usage pattern) over a video file or camera,
writing an annotated output video and a JSON verdict summary."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="Analyze a video for deepfakes")
    p.add_argument("input", help="video path, or an integer camera index")
    p.add_argument("--output", default=None, help="annotated output video path")
    p.add_argument("--weights", default=None, help="best_model.pth / .npz")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--max-frames", type=int, default=0, help="0 = all")
    p.add_argument("--json", dest="json_out", default=None,
                   help="write the per-frame results to this JSON file")
    args = p.parse_args(argv)

    import cv2
    from ..core.config import DetectorConfig
    from ..pipeline.detector import DeepfakeDetector

    det = DeepfakeDetector(
        DetectorConfig().with_threshold(args.threshold),
        weights_path=args.weights)

    src = int(args.input) if args.input.isdigit() else args.input
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        sys.exit(f"cannot open {args.input}")

    writer = None
    results = []
    n = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        annotated, _, _, data = det.predict(frame)
        results.append({k: data[k] for k in
                        ("frame_count", "faces_detected", "confidence_level",
                         "temporal_average", "analysis_mode")})
        if args.output:
            if writer is None:
                h, w = annotated.shape[:2]
                fps = cap.get(cv2.CAP_PROP_FPS) or 30
                writer = cv2.VideoWriter(
                    args.output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
            writer.write(annotated)
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    cap.release()
    if writer is not None:
        writer.release()

    final = results[-1]["confidence_level"] if results else "UNCERTAIN"
    summary = {
        "frames": n,
        "final_verdict": final,
        "temporal_average": results[-1]["temporal_average"] if results else 0.0,
        "voting": det.temporal_tracker.get_voting_stats(),
    }
    print(json.dumps(summary, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"summary": summary, "frames": results}, f, indent=2)


if __name__ == "__main__":
    main()
