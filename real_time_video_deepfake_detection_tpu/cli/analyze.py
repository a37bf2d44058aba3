"""Offline/webcam analysis CLI — the library `predict` loop (reference
deepfake_detection.py:588-686 usage pattern) over a video file or camera,
writing an annotated output video and a JSON verdict summary.

Given MULTIPLE video paths, switches to the batched MultiStreamEngine:
every video is a stream slot and all of them classify in the same device
ticks (the serving hot path, offline) — per-video verdicts come out in one
JSON summary. The reference has no offline batch mode; this is the
multi-stream upgrade applied to files instead of HTTP clients.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_params(weights, spec):
    """--weights loading shared with serving/server.py (utils/weights.py):
    reference .pth via the torch converter, a trainer .npz params pytree,
    or a TrainState resume checkpoint (unwrapped to its EMA params)."""
    from ..utils.weights import load_params_any
    return load_params_any(weights, spec)


def _analyze_multi(args) -> None:
    """N videos through the batched engine: one reader thread per video
    feeds engine.analyze(frame, stream_id=path); frames from different
    videos share device ticks exactly like concurrent HTTP streams."""
    import threading

    import cv2
    from ..core.config import DetectorConfig, ServerConfig
    from ..models import backbones
    from ..serving.multi import MultiStreamEngine

    if args.output:
        sys.exit("--output is single-video only (batch mode writes no "
                 "annotated video); drop it or pass one input")

    spec = backbones.make(args.backbone)
    cfg = DetectorConfig().with_threshold(args.threshold)
    scfg = ServerConfig(detection_threshold=args.threshold,
                        max_streams=max(len(args.input), 2))
    engine = MultiStreamEngine(cfg, scfg, params=_load_params(args.weights, spec),
                               spec=spec)

    summaries = [None] * len(args.input)

    def run_one(i: int, path: str) -> None:
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            summaries[i] = {"input": path, "error": "cannot open"}
            return
        n, last = 0, None
        try:
            while True:
                ret, frame = cap.read()
                if not ret:
                    break
                r = engine.analyze(frame, stream_id=path)
                if "error" in r:
                    # a device-tick failure surfaces as {'error': ...}
                    # (serving/multi.py batcher exception path) — report it
                    # per-video instead of dying with a KeyError and a null
                    summaries[i] = {"input": path, "frames": n,
                                    "error": r["error"]}
                    return
                last = r
                n += 1
                if args.max_frames and n >= args.max_frames:
                    break
        except Exception as e:   # tick timeout etc. — never a null summary
            summaries[i] = {"input": path, "frames": n,
                            "error": f"{type(e).__name__}: {e}"}
            return
        finally:
            cap.release()
        summaries[i] = {
            "input": path, "frames": n,
            "final_verdict": last["confidence_level"] if last else "UNCERTAIN",
            "temporal_average": last["temporal_average"] if last else 0.0,
            "fake_probability": last["fake_probability"] if last else 0.0,
        }

    threads = [threading.Thread(target=run_one, args=(i, path), daemon=True)
               for i, path in enumerate(args.input)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    engine.shutdown()

    out = {"videos": summaries,
           "engine_ticks": engine.metrics["ticks"],
           "frames_total": engine.metrics["frames_total"],
           "max_batch_seen": engine.metrics["max_batch_seen"]}
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


def main(argv=None):
    p = argparse.ArgumentParser(description="Analyze video(s) for deepfakes")
    p.add_argument("input", nargs="+",
                   help="video path(s), or an integer camera index; more "
                        "than one path runs them batched through the "
                        "multi-stream engine")
    p.add_argument("--output", default=None, help="annotated output video path")
    p.add_argument("--weights", default=None, help="best_model.pth / .npz")
    from ..models.backbones import backbone_names
    p.add_argument("--backbone", default="b0", choices=backbone_names(),
                   help="classifier backbone the weights were trained for "
                        "(config 5 swap; must match --weights)")
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

    if len(args.input) > 1:
        return _analyze_multi(args)

    import numpy as np
    import cv2
    from ..core.config import DetectorConfig
    from ..models import backbones
    from ..pipeline.detector import DeepfakeDetector

    # same checkpoint dispatch as the server and the multi-video path
    # (.pth via the torch converter, trainer .npz / resume TrainState via
    # the shared loader) — weights_path= would only handle .pth
    spec = backbones.make(args.backbone)
    det = DeepfakeDetector(
        DetectorConfig().with_threshold(args.threshold),
        params=_load_params(args.weights, spec), spec=spec,
        enable_gradcam=args.gradcam)

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

    inp = args.input[0]
    src = int(inp) if inp.isdigit() else inp
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        sys.exit(f"cannot open {inp}")

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
