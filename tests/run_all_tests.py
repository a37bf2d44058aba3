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
    ("test_native_prep.py", "C++ one-call prep: detect+align+CLAHE vs python"),
    ("test_performance.py", "Latency budgets + resource bounds"),
    ("test_haar.py", "From-scratch Viola-Jones vs cascade XML semantics"),
    ("test_calibration.py", "Isotonic calibrator fit/apply"),
    ("test_device_detect.py", "In-tick SSD detect + crop/align + MTCNN parity"),
    ("test_load_64streams.py", "Full-occupancy engine: fairness, LRU, buckets"),
    ("test_mtcnn_parity.py", "facenet-pytorch numeric oracle for the cascade"),
    ("test_spmd_train.py", "Sharded train step on the virtual device mesh"),
    ("test_weight_drill.py", "torch ckpt -> server -> JSON end-to-end drill"),
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
