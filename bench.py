"""End-to-end serving benchmark — driver contract: ONE JSON line, rc 0.

Implementation lives in the package (cli/bench.py, also installed as the
`rtvdd-bench` console script); this repo-root shim preserves the driver's
`python bench.py` invocation.
"""

from real_time_video_deepfake_detection_tpu.cli.bench import main

if __name__ == "__main__":
    main()
