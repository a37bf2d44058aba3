"""HTTP serving frontend — the reference's API surface, bit-for-bit.

Routes and JSON schemas preserved exactly from backend_server.py:82-255 so
the reference Chrome extension works unchanged:

  GET  /health  -> status/model_loaded/device/gpu_name/frame_count/capabilities
  POST /reset   -> {success, message}
  POST /analyze -> face / frame_only result schema (+400/429/500 errors)
  GET  /stats   -> frame_count/temporal_average/stability_score/...

Rate limiting: global >=100 ms between /analyze requests -> 429 with
retry_after_ms (backend_server.py:61-80).
"""

from __future__ import annotations

import argparse
import logging
import threading
import time
from typing import Optional

import numpy as np

from ..core.config import DetectorConfig, ServerConfig
from ..pipeline.detector import DeepfakeDetector
from .wsgi import App, Request, Response, jsonify

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s [%(levelname)s] %(message)s",
                    datefmt="%H:%M:%S")
logger = logging.getLogger(__name__)


def _decode_frame(data: bytes) -> Optional[np.ndarray]:
    """JPEG/PNG/BMP bytes -> BGR u8, host-side ingest decode (entropy
    decoding is inherently serial; the batch feeds the TPU afterwards —
    reference: backend_server.py:140-142). JPEG goes through the native
    libjpeg path (native/ingest.cpp, no GIL); PNG/BMP fall back to cv2."""
    if data[:2] == b"\xff\xd8":
        from ..utils.native_ingest import decode_jpeg
        frame = decode_jpeg(data)
        if frame is not None:
            return frame
    import cv2
    arr = np.frombuffer(data, np.uint8)
    if arr.size == 0:
        return None
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def _device_strings():
    import jax
    try:
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", dev.platform)
        if dev.platform in ("tpu", "axon"):
            return f"tpu:{dev.id}", str(kind)
        return f"{dev.platform}:{dev.id}", None
    except Exception:
        return "cpu", None


def create_app(detector: Optional[DeepfakeDetector] = None,
               server_cfg: ServerConfig = ServerConfig()) -> App:
    app = App()
    if detector is None:
        detector = DeepfakeDetector(
            DetectorConfig().with_threshold(server_cfg.detection_threshold))
    app.detector = detector  # exposed for tests

    rate_lock = threading.Lock()
    state = {"last_request_time": 0.0}
    device_str, accel_name = _device_strings()

    @app.route("/health", methods=["GET"])
    def health(_req: Request) -> Response:
        return jsonify({
            "status": "healthy",
            "model_loaded": detector.model_loaded or detector.params is not None,
            "device": device_str,
            "gpu_name": accel_name,
            "frame_count": detector.frame_count,
            "capabilities": {
                "face_detection": True,
                "frame_forensics": True,
                "temporal_tracking": True,
            },
        })

    @app.route("/reset", methods=["POST"])
    def reset(_req: Request) -> Response:
        try:
            detector.reset()
            return jsonify({"success": True,
                            "message": "Detector reset successfully"})
        except Exception as e:
            logger.error(f"Reset failed: {e}")
            return jsonify({"success": False, "error": str(e)}, 500)

    @app.route("/analyze", methods=["POST"])
    def analyze(req: Request) -> Response:
        # Rate limit (backend_server.py:66-80)
        with rate_lock:
            now = time.time()
            elapsed = now - state["last_request_time"]
            if elapsed < server_cfg.min_request_interval:
                return jsonify({
                    "error": "Rate limited",
                    "retry_after_ms": int(
                        (server_cfg.min_request_interval - elapsed) * 1000),
                }, 429)
            state["last_request_time"] = now

        start_time = time.time()
        try:
            if "frame" not in req.files:
                return jsonify({"error": "No frame provided"}, 400)
            frame = _decode_frame(req.files["frame"])
            if frame is None:
                return jsonify({"error": "Invalid image format"}, 400)

            # Server-path semantics: forensics FIRST, then faces, then the
            # frame-count increment (backend_server.py:147-156).
            frame_forensic = detector.analyze_frame_forensics(frame)
            frame_forensic_prob = frame_forensic["fake_probability"]

            faces = detector.face_detector(frame)
            detector.frame_count += 1

            if len(faces) > 0:
                x, y, w, h = faces[0]
                face_region = frame[y:y + h, x:x + w]
                fake_prob, _, _ = detector.analyze_face(face_region)
                if fake_prob is not None:
                    detector.temporal_tracker.update(fake_prob)
                    confidence_level = detector.temporal_tracker.get_confidence_level()
                    temporal_avg = detector.temporal_tracker.get_temporal_average()
                    stability = detector.temporal_tracker.get_stability_score()
                    processing_time = (time.time() - start_time) * 1000
                    logger.info(
                        f"Frame {detector.frame_count} | Face: {fake_prob*100:.0f}% | "
                        f"Forensic: {frame_forensic_prob*100:.0f}% | "
                        f"Verdict: {confidence_level} | {processing_time:.0f}ms")
                    return jsonify({
                        "success": True,
                        "analysis_mode": "face+frame",
                        "faces_detected": len(faces),
                        "fake_probability": float(fake_prob),
                        "face_probability": float(fake_prob),
                        "frame_forensic_probability": float(frame_forensic_prob),
                        "real_probability": float(1 - fake_prob),
                        "confidence_level": confidence_level,
                        "temporal_average": float(temporal_avg),
                        "stability_score": float(stability),
                        "frame_count": detector.frame_count,
                        "processing_time_ms": round(processing_time, 1),
                        "face_bbox": {"x": int(x), "y": int(y),
                                      "width": int(w), "height": int(h)},
                    })

            detector.temporal_tracker.update(frame_forensic_prob)
            confidence_level = detector.temporal_tracker.get_confidence_level()
            temporal_avg = detector.temporal_tracker.get_temporal_average()
            stability = detector.temporal_tracker.get_stability_score()
            processing_time = (time.time() - start_time) * 1000
            logger.info(
                f"Frame {detector.frame_count} [NO FACE] | "
                f"Forensic: {frame_forensic_prob*100:.0f}% | "
                f"Verdict: {confidence_level} | {processing_time:.0f}ms")
            return jsonify({
                "success": True,
                "analysis_mode": "frame_only",
                "faces_detected": len(faces),
                "fake_probability": float(frame_forensic_prob),
                "frame_forensic_probability": float(frame_forensic_prob),
                "real_probability": float(1 - frame_forensic_prob),
                "confidence_level": confidence_level,
                "temporal_average": float(temporal_avg),
                "stability_score": float(stability),
                "frame_count": detector.frame_count,
                "processing_time_ms": round(processing_time, 1),
            })
        except Exception as e:
            logger.exception("Error analyzing frame")
            return jsonify({"error": str(e)}, 500)

    @app.route("/stats", methods=["GET"])
    def stats(_req: Request) -> Response:
        try:
            voting = detector.temporal_tracker.get_voting_stats()
            return jsonify({
                "frame_count": detector.frame_count,
                "temporal_average": float(detector.temporal_tracker.get_temporal_average()),
                "stability_score": float(detector.temporal_tracker.get_stability_score()),
                "confidence_level": detector.temporal_tracker.get_confidence_level(),
                "history_length": detector.temporal_tracker.history_length,
                "voting": voting,
                "device": device_str,
            })
        except Exception as e:
            return jsonify({"error": str(e)}, 500)

    return app


def serve(host: str = "0.0.0.0", port: int = 5000,
          detector: Optional[DeepfakeDetector] = None,
          server_cfg: Optional[ServerConfig] = None) -> None:
    """Threaded WSGI server (stdlib) — reference runs Flask threaded on
    0.0.0.0:5000 (backend_server.py:275)."""
    from socketserver import ThreadingMixIn
    from wsgiref.simple_server import WSGIServer, make_server

    cfg = server_cfg or ServerConfig(host=host, port=port)
    # an explicit ServerConfig is authoritative: its host/port fields bind
    # the socket (previously they were silently ignored in favor of the
    # positional defaults)
    host, port = cfg.host, cfg.port
    app = create_app(detector, cfg)

    class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
        daemon_threads = True

    httpd = make_server(host, port, app, server_class=ThreadingWSGIServer)
    logger.info(f"Deepfake Detection Backend Server on http://{host}:{port}")
    httpd.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU-native deepfake detection server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--weights", default=None,
                   help="classifier weights: best_model.pth (reference "
                        "torch format, EfficientNet only) or an .npz pytree "
                        "saved by the trainer (any backbone)")
    from ..models.backbones import backbone_names
    p.add_argument("--backbone", default="b0", choices=backbone_names(),
                   help="classifier backbone (config 5 swap): EfficientNet "
                        "b0..b7, vit_s16/b16/l16, or xception; with "
                        "--clip-window the temporal head's feature dim "
                        "follows the backbone automatically")
    p.add_argument("--threshold", type=float, default=0.55)
    p.add_argument("--batched", action="store_true",
                   help="multi-stream dynamic-batching engine (config 4): "
                        "clients may send stream_id / X-Stream-Id")
    p.add_argument("--max-streams", type=int, default=64)
    p.add_argument("--batch-timeout-ms", type=float, default=5.0)
    p.add_argument("--max-batch", type=int, default=64,
                   help="cap requests per device tick; below --max-streams "
                        "this is the latency mode (e.g. 32: 64 streams are "
                        "served as two interleaved 32-slot tick groups — "
                        "~25%% lower per-frame latency for some aggregate "
                        "throughput)")
    p.add_argument("--mtcnn-weights", default=None,
                   help="facenet-pytorch pnet/rnet/onet weights (dir or .pt); "
                        "enables the JAX MTCNN aligner in the face path "
                        "(deepfake_detection.py:24-28)")
    p.add_argument("--clip-window", type=int, default=0,
                   help="batched mode only: replace the majority vote with "
                        "a temporal-attention head over the last N backbone "
                        "feature vectors (BASELINE config 5); 0 = off")
    p.add_argument("--clip-head", default=None,
                   help="temporal-head weights (.npz pytree); random init "
                        "when omitted (demo mode)")
    p.add_argument("--face-backend", default="auto",
                   choices=["auto", "ssd", "haar", "haar_native", "heuristic"],
                   help="pin a detector-ladder rung (pipeline/faces.py)")
    p.add_argument("--ssd-weights", default=None,
                   help="res10 caffemodel path (deploy.prototxt alongside); "
                        "enables the SSD ladder rung and --device-detect")
    p.add_argument("--device-detect", action="store_true",
                   help="batched mode only: run SSD detection + crop/align "
                        "inside the device tick (one XLA program for "
                        "capture->verdict); requires --ssd-weights")
    p.add_argument("--scaled-decode", action="store_true",
                   help="batched mode: pooled tick ingest uses libjpeg "
                        "DCT-scaled decode (>=2x target) before the resize "
                        "— cuts host decode cost on large captures; pixels "
                        "deviate from the reference's full-decode path "
                        "(docs/DESIGN.md)")
    p.add_argument("--mtcnn-device", action="store_true",
                   help="with --device-detect and --mtcnn-weights: run the "
                        "MTCNN P/R/O alignment cascade inside the tick too "
                        "(the reference's full face path in one program); "
                        "the cascade sees the crop resized to 160 "
                        "(documented deviation, docs/DESIGN.md)")
    p.add_argument("--ingest-plane", default="bgr",
                   choices=["bgr", "coef", "ycbcr420"],
                   help="with --device-detect: wire format for JPEG ingest. "
                        "'coef' = host does entropy decode only, the tick "
                        "finishes the decode on device (bit-exact; "
                        "collapses the per-core host decode ceiling); "
                        "'ycbcr420' = raw 4:2:0 planes, half the "
                        "host->device bytes (bit-exact). Ineligible JPEGs "
                        "fall back to the full-decode path automatically")
    args = p.parse_args(argv)
    if args.ingest_plane != "bgr" and not args.device_detect:
        raise SystemExit("--ingest-plane requires --device-detect")
    import dataclasses as _dc
    from ..models import backbones
    spec = backbones.make(args.backbone)
    cfg = _dc.replace(DetectorConfig().with_threshold(args.threshold),
                      face_backend=args.face_backend,
                      clip_window=args.clip_window,
                      clip_feature_dim=backbones.feature_dim(spec))
    if args.mtcnn_device:
        if not (args.device_detect and args.mtcnn_weights):
            raise SystemExit("--mtcnn-device requires --device-detect "
                             "and --mtcnn-weights")
        cfg = _dc.replace(cfg, mtcnn_device=True)
    if args.device_detect:
        if not args.batched:
            raise SystemExit("--device-detect requires --batched (the fused "
                             "detect tick lives in the multi-stream engine)")
        if not args.ssd_weights:
            raise SystemExit("--device-detect requires --ssd-weights "
                             "(res10 caffemodel for the in-tick SSD)")
        if args.face_backend not in ("auto", "ssd"):
            # the fused tick always detects with the in-tick SSD; honoring
            # an explicitly pinned non-SSD rung is impossible here, and
            # silently overriding it is the failure mode the ladder's
            # loud-degradation warning exists to prevent (pipeline/faces.py)
            raise SystemExit(
                f"--device-detect runs SSD detection inside the device tick "
                f"and cannot honor --face-backend {args.face_backend}; drop "
                "the pin (or use 'ssd'), or serve without --device-detect")
        # the reference applies CLAHE to every face crop
        # (deepfake_detection.py:357-370); in device-detect mode the crop
        # never touches the host, so CLAHE must run in the tick — without
        # this the fused path would silently classify un-CLAHE'd crops
        cfg = _dc.replace(cfg, clahe_device=True)
    aligner = None
    if args.mtcnn_weights:
        from ..models.mtcnn import MTCNNAligner
        aligner = MTCNNAligner.from_weights(args.mtcnn_weights)

    def _load_params():
        from ..utils.weights import load_params_any
        return load_params_any(args.weights, spec)

    if args.batched:
        from socketserver import ThreadingMixIn
        from wsgiref.simple_server import WSGIServer, make_server
        from .multi import MultiStreamEngine, create_batched_app

        scfg = ServerConfig(detection_threshold=args.threshold,
                            max_streams=args.max_streams,
                            max_batch=args.max_batch,
                            batch_timeout_ms=args.batch_timeout_ms,
                            device_detect=args.device_detect,
                            ingest_scaled_decode=args.scaled_decode,
                            ingest_plane=args.ingest_plane)
        params = _load_params()
        clip_head = None
        if args.clip_head:
            from ..train.checkpoint import load_checkpoint as load_tree
            clip_head, _, _ = load_tree(args.clip_head,
                                        restore_host_rng=False)
        fd = None
        if args.ssd_weights:
            from ..pipeline.faces import FaceDetector
            fd = FaceDetector(ssd_weights_path=args.ssd_weights,
                              confidence_threshold=cfg.ssd_confidence_threshold,
                              min_face_px=cfg.min_face_px,
                              backend=args.face_backend)
        engine = MultiStreamEngine(cfg, scfg, params=params, spec=spec,
                                   aligner=aligner, face_detector=fd,
                                   clip_head_params=clip_head)
        app = create_batched_app(engine, scfg)

        class ThreadingWSGIServer(ThreadingMixIn, WSGIServer):
            daemon_threads = True

        httpd = make_server(args.host, args.port, app,
                            server_class=ThreadingWSGIServer)
        logger.info(f"Batched deepfake server ({args.max_streams} streams) "
                    f"on http://{args.host}:{args.port}")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            # stop the batcher/drain threads so Ctrl-C exits promptly
            # instead of hanging on non-daemon engine threads
            engine.shutdown()
        return
    det = DeepfakeDetector(cfg, params=_load_params(), spec=spec,
                           ssd_weights_path=args.ssd_weights,
                           mtcnn_weights_path=args.mtcnn_weights)
    serve(args.host, args.port, det)


if __name__ == "__main__":
    main()
