"""Test-plan runner (reference tests/run_all_tests.py style): prints the
plan table, shells out to pytest, and summarizes PASS/FAIL counts."""

import re
import subprocess
import sys

PLAN = [
    ("test_tracker.py", "Verdict contract: strict threshold, majority vote, ties, reset, batching"),
    ("test_forensics.py", "Six forensic signals: cv2 bit-exact goldens + reference sequence parity"),
    ("test_efficientnet.py", "EfficientNet-B0 arch, converter schema, torch parity"),
    ("test_caffe_net.py", "Caffe->JAX compiler: parser, conv/pool parity, SSD DetectionOutput"),
    ("test_mtcnn.py", "MTCNN cascades: shapes, converter, NMS, aligner flow"),
    ("test_detector.py", "Detector orchestration, CLAHE goldens, face ladder"),
    ("test_api.py", "HTTP surface: schemas, error codes, rate limit, reset"),
    ("test_multi_stream.py", "Batched serving: stream isolation, concurrency, parity"),
    ("test_training.py", "Losses, sampler, augmentation, checkpoints, fused step"),
    ("test_backbone_swap.py", "ViT + TP sharding, temporal attention head, B4"),
    ("test_pallas_kernels.py", "Pallas kernels vs jnp reference equivalence"),
    ("test_freq_features.py", "FFT+DCT features, GradCAM"),
    ("test_native_ingest.py", "C++ ingest: decode/resize bit-exactness"),
    ("test_performance.py", "Latency budgets + resource bounds"),
]


def main():
    print("=" * 78)
    print(f"{'Test file':34s} What it covers")
    print("-" * 78)
    for f, what in PLAN:
        print(f"{f:34s} {what}")
    print("=" * 78)

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        capture_output=True, text=True)
    out = proc.stdout + proc.stderr
    print(out[-3000:])
    m = re.search(r"(\d+) passed", out)
    f = re.search(r"(\d+) failed", out)
    passed = int(m.group(1)) if m else 0
    failed = int(f.group(1)) if f else 0
    print(f"TOTAL: {passed} passed, {failed} failed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
