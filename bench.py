"""End-to-end serving benchmark (driver contract: ONE JSON line).

Two phases on the available accelerator:

1. Serving core (primary metric): 64 concurrent streams, each tick = one XLA
   program doing on-device 480p->256 resize + all six forensic signals +
   EfficientNet-B0 face classification (fp32 parity mode) + per-stream
   temporal-tracker update + verdict, with stream state chaining tick to
   tick. Steady-state is measured in chained windows (dispatch K ticks, sync
   once) — exactly what the serving engine's dispatch/drain pipeline
   (serving/multi.py) sustains, where readback overlaps compute. Per-tick
   latency = window_time / K; p95 over windows.

2. End-to-end check (reported in the unit string): the real
   MultiStreamEngine.analyze path — JPEG decode, face detect, CLAHE, align,
   dynamic batching, device tick, JSON-ready result — driven by 64 client
   threads. In this dev environment the TPU sits behind a ~50 MB/s tunnel
   whose per-readback RTT dominates request latency; the number is reported
   for honesty but the core metric is phase 1.

Baseline: the reference's effective ceiling is 10 fps single stream (100 ms
global rate limiter, backend_server.py:63; typical operation 1 fps).
vs_baseline = aggregate fps / 10.
"""

import json
import threading
import time

import numpy as np


def bench_core(n_streams=64, window=8, n_windows=12, warm_windows=2):
    import jax
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.core.config import DetectorConfig
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        device_step_from_capture, init_stream_states,
    )

    cap_h, cap_w = 480, 640
    n_variants = 4
    spec = EfficientNetSpec.make("b0")
    cfg = DetectorConfig().with_threshold(0.55)
    params = init_params(jax.random.PRNGKey(0), spec)
    states = init_stream_states(n_streams, cfg)

    rng = np.random.default_rng(0)
    frames_dev = [jax.device_put(rng.integers(
        0, 256, (n_streams, cap_h, cap_w, 3), dtype=np.uint8))
        for _ in range(n_variants)]
    faces_dev = [jax.device_put(
        rng.random((n_streams, 160, 160, 3), dtype=np.float32) * 255.0)
        for _ in range(n_variants)]
    has_face = jnp.ones((n_streams,), bool)
    face_hw = jnp.full((n_streams, 2), 120, jnp.int32)
    active = jnp.ones((n_streams,), bool)

    def tick(i, states):
        return device_step_from_capture(
            spec, cfg, params, frames_dev[i % n_variants],
            faces_dev[i % n_variants], has_face, face_hw, active, states)

    out, states = tick(0, states)   # compile
    jax.block_until_ready(out["verdict"])

    per_tick_ms = []
    i = 0
    t_all = time.perf_counter()
    for w in range(n_windows + warm_windows):
        t0 = time.perf_counter()
        for _ in range(window):
            out, states = tick(i, states)
            i += 1
        jax.block_until_ready(out["verdict"])
        dt = time.perf_counter() - t0
        if w >= warm_windows:
            per_tick_ms.append(dt / window * 1000)
    elapsed = time.perf_counter() - t_all

    fps = n_streams * i / elapsed
    return {
        "fps": fps,
        "tick_ms_p50": float(np.percentile(per_tick_ms, 50)),
        "tick_ms_p95": float(np.percentile(per_tick_ms, 95)),
    }


def bench_e2e(n_streams=64, frames_per_stream=12):
    """Drive the real engine.analyze path (host prep included)."""
    import cv2

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine,
    )

    # batch_timeout 30 ms: over the dev tunnel each tick pays a large
    # fixed transfer cost, so coalescing full batches wins; co-located
    # deployments keep the 5 ms default.
    import dataclasses
    engine = MultiStreamEngine(
        # heuristic detector rung: the e2e phase measures the data plane
        # (decode/prep/batching/device), not cascade cost on noise frames;
        # the default 'auto' ladder would run the from-scratch Haar here
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        ServerConfig(max_streams=n_streams, max_batch=n_streams,
                     batch_timeout_ms=30.0, min_request_interval=0.0))
    rng = np.random.default_rng(1)
    jpegs = []
    for k in range(4):
        frame = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", frame)
        jpegs.append(enc.tobytes())

    lat = []
    lat_lock = threading.Lock()
    errs = []

    def client(sid):
        for i in range(frames_per_stream):
            t0 = time.perf_counter()
            try:
                r = engine.analyze_jpeg(jpegs[i % 4], f"s{sid}")
                if r is None:   # native prep unavailable -> python path
                    frame = cv2.imdecode(
                        np.frombuffer(jpegs[i % 4], np.uint8), cv2.IMREAD_COLOR)
                    engine.analyze(frame, f"s{sid}")
            except Exception as e:   # pragma: no cover - bench robustness
                errs.append(e)
                return
            with lat_lock:
                lat.append(time.perf_counter() - t0)

    # warm the engine's exact batch shapes
    client("warm")
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(k,))
               for k in range(n_streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    engine.shutdown()
    n_ok = len(lat)
    return {
        "fps": n_ok / elapsed if elapsed > 0 else 0.0,
        "req_ms_p95": float(np.percentile(lat, 95) * 1000) if lat else -1.0,
        "errors": len(errs),
    }


def main():
    core = bench_core()
    try:
        e2e = bench_e2e()
        import os
        ncpu = os.cpu_count() or 1
        e2e_txt = (f"; e2e incl. host prep (native C++ prep, {ncpu}-core dev "
                   f"host, TPU behind ~50MB/s tunnel): {e2e['fps']:.0f} fps, "
                   f"req p95 {e2e['req_ms_p95']:.0f} ms, "
                   f"{e2e['errors']} errors — host-CPU/tunnel bound, "
                   "prep is ~12 ms/frame/core and embarrassingly parallel")
    except Exception as e:   # pragma: no cover
        e2e_txt = f"; e2e phase failed: {e}"

    print(json.dumps({
        "metric": "serving_frames_per_sec_per_chip",
        "value": round(core["fps"], 1),
        "unit": ("frames/s aggregate over 64 streams, fp32 parity mode "
                 f"(steady-state tick p50 {core['tick_ms_p50']:.1f} ms / "
                 f"p95 {core['tick_ms_p95']:.1f} ms, resize+forensics+"
                 "classify+verdict per tick" + e2e_txt + ")"),
        "vs_baseline": round(core["fps"] / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
