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
    p.add_argument("--gradcam", action="store_true",
                   help="blend a GradCAM heatmap over each detected face in "
                        "the annotated output (the reference imports "
                        "pytorch_grad_cam but ships it permanently disabled, "
                        "deepfake_detection.py:543-544; here it works — "
                        "models/gradcam.py)")
    args = p.parse_args(argv)

    import numpy as np
    import cv2
    from ..core.config import DetectorConfig
    from ..pipeline.detector import DeepfakeDetector

    det = DeepfakeDetector(
        DetectorConfig().with_threshold(args.threshold),
        weights_path=args.weights, enable_gradcam=args.gradcam)

    def blend_gradcams(annotated):
        """JET-colormap blend of each face's (224,224) [0,1] heatmap over
        its bbox, alpha 0.4 — the standard CAM presentation."""
        for (x, y, w, h), cam in det.last_gradcams:
            hm = cv2.applyColorMap(
                (np.clip(cam, 0.0, 1.0) * 255).astype(np.uint8),
                cv2.COLORMAP_JET)
            hm = cv2.resize(hm, (w, h), interpolation=cv2.INTER_LINEAR)
            roi = annotated[y:y + h, x:x + w]
            annotated[y:y + h, x:x + w] = cv2.addWeighted(
                roi, 0.6, hm[:roi.shape[0], :roi.shape[1]], 0.4, 0.0)
        return annotated

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
        if args.gradcam and det.last_gradcams:
            annotated = blend_gradcams(annotated)
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
