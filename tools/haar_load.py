"""Sustained-load cost of the Haar fallback rung (the one detector rung the
bench never exercises: bench e2e pins the heuristic rung and --device-detect
runs SSD in the tick).

Measures the native C++ Viola-Jones evaluator (models/haar_cascade.py +
native/haar.cpp, the ladder's rung 3) per-frame on 640x480 BGR frames —
face-bearing and empty — under a steady loop, and reports ms/frame + the
frames/s one host core sustains. The reference's Haar path is
cv2.detectMultiScale on the same cascade (face_detection.py:108-123);
detection work is per-frame host CPU either way, so rung capacity scales
linearly in cores (the evaluator is per-call-local / GIL-free).

Usage: python tools/haar_load.py [n_frames_per_kind]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_face_frame(rng, h=480, w=640):
    """Skin-tone ellipse + eye blobs on a textured background — the test
    suite's synthetic-face recipe (reference tests/test_functional.py:24-34),
    enough structure for Viola-Jones to run its full stage ladder."""
    frame = rng.integers(40, 90, (h, w, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx, ry, rx = h // 2, w // 2, h // 4, w // 6
    face = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    frame[face] = (105, 140, 190)  # BGR skin-ish
    for ex in (cx - rx // 2, cx + rx // 2):
        eye = ((yy - (cy - ry // 3)) ** 2 + (xx - ex) ** 2) <= 15 ** 2
        frame[eye] = (30, 30, 30)
    return frame


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from real_time_video_deepfake_detection_tpu.models.haar_cascade import (
        detect_haar_native, native_haar_available,
    )

    if not native_haar_available():
        print("native haar unavailable (no g++ or cascade XML) — nothing to measure")
        return 1

    rng = np.random.default_rng(7)
    face_frames = [synth_face_frame(rng) for _ in range(8)]
    noise_frames = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                    for _ in range(8)]

    # warmup builds the .so and fills caches
    for f in (face_frames[0], noise_frames[0]):
        detect_haar_native(f)

    results = {}
    for kind, frames in (("face", face_frames), ("noise", noise_frames)):
        t0 = time.perf_counter()
        hits = 0
        for i in range(n):
            boxes = detect_haar_native(frames[i % len(frames)])
            hits += bool(boxes)
        dt = time.perf_counter() - t0
        results[kind] = (dt / n * 1e3, n / dt, hits)

    for kind, (ms, fps, hits) in results.items():
        print(f"haar-native {kind:5s}: {ms:7.1f} ms/frame  "
              f"{fps:6.1f} fps/core  (frames with detections: {hits}/{n})")
    blended = 2.0 / (results["face"][0] + results["noise"][0]) * 1e3
    need_cores = 1920.0 / blended
    print(f"blended: {blended:.1f} fps/core -> the 64x30fps target needs "
          f"~{need_cores:.0f} cores on this rung (vs SSD-in-tick: 0 host "
          f"cores for detection). Rung ordering in pipeline/faces.py stands.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
