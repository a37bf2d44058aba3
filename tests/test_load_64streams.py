"""Full-occupancy 64-stream load test (SURVEY.md §4 implication (d),
round-2 verdict #7): fairness, state isolation under LRU eviction, and
bucket transitions in the batched engine under real thread concurrency.

A tiny ViT backbone keeps per-tick classifier FLOPs CPU-friendly so the test
exercises the ENGINE (queue, buckets, slots, locking), not matmul speed.
"""

import dataclasses
import threading

import numpy as np
import pytest

from real_time_video_deepfake_detection_tpu.core.config import (
    DetectorConfig, ServerConfig,
)
from real_time_video_deepfake_detection_tpu.models import vit
from real_time_video_deepfake_detection_tpu.serving.multi import (
    MultiStreamEngine,
)

rng = np.random.default_rng(23)

_TINY_VIT = vit.ViTSpec("s16", depth=2, dim=64, heads=2, mlp_ratio=4,
                        patch=16, image_size=224)


def _face_frame():
    """Frame the skin-heuristic detector finds a face in."""
    f = np.zeros((240, 320, 3), np.uint8)
    f[:] = (40, 40, 40)
    # BGR skin-ish ellipse block in the center
    f[60:180, 110:210] = (120, 160, 210)
    return f


def _noface_frame():
    return np.full((240, 320, 3), 16, np.uint8)


@pytest.mark.slow
def test_64_streams_full_occupancy_fairness():
    """64 concurrent streams, mixed face/no-face, every request completes
    with the right per-stream frame_count; occupancy reaches the full
    64-batch bucket."""
    n_streams, frames_each = 64, 6
    eng = MultiStreamEngine(
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        ServerConfig(max_streams=n_streams, max_batch=n_streams,
                     batch_timeout_ms=10.0, min_request_interval=0.0),
        spec=_TINY_VIT)
    face, noface = _face_frame(), _noface_frame()
    results = {}
    errors = []

    def client(sid):
        mine = []
        frame = face if sid % 2 == 0 else noface
        try:
            for _ in range(frames_each):
                mine.append(eng.analyze(frame, f"s{sid}"))
        except Exception as e:   # pragma: no cover
            errors.append((sid, e))
        results[sid] = mine

    threads = [threading.Thread(target=client, args=(k,))
               for k in range(n_streams)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors[:3]
    assert len(results) == n_streams
    for sid, mine in results.items():
        assert len(mine) == frames_each, sid
        # per-stream counts are ordered and complete
        assert [r["frame_count"] for r in mine] == list(
            range(1, frames_each + 1)), (sid, mine)
        # mixed modes land where expected
        want_mode = "face+frame" if sid % 2 == 0 else "frame_only"
        assert all(r["analysis_mode"] == want_mode for r in mine), sid
        # verdict gating: UNCERTAIN until the 10-vote window fills
        assert all(r["confidence_level"] == "UNCERTAIN" for r in mine), sid
    # the tick batcher reached high occupancy (bucket transitions happened:
    # early ticks are small, steady-state large)
    assert eng.metrics["max_batch_seen"] >= 32
    assert eng.metrics["frames_total"] == n_streams * frames_each
    eng.shutdown()


@pytest.mark.slow
def test_lru_eviction_under_load_preserves_isolation():
    """More streams than slots: LRU eviction recycles slots, evicted state
    is zeroed (a returning stream starts fresh), and survivors keep their
    counts."""
    eng = MultiStreamEngine(
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        ServerConfig(max_streams=4, max_batch=4, batch_timeout_ms=2.0,
                     min_request_interval=0.0),
        spec=_TINY_VIT)
    f = _noface_frame()

    # fill all 4 slots, with "keep" the most recently used
    for sid in ("a", "b", "c", "keep"):
        for _ in range(2):
            eng.analyze(f, sid)
    eng.analyze(f, "keep")
    assert eng.frame_count("keep") == 3

    # 4 new streams -> evict the 4 LRU ("a","b","c" then... "keep" is newest
    # so survives the first 3 evictions)
    for sid in ("x", "y", "z"):
        r = eng.analyze(f, sid)
        assert r["frame_count"] == 1
    assert eng.frame_count("keep") == 3      # survivor untouched

    # "a" was evicted: returning starts from a FRESH slot/state
    r = eng.analyze(f, "a")
    assert r["frame_count"] == 1
    eng.shutdown()


@pytest.mark.slow
def test_interleaved_resets_under_load():
    """Concurrent /reset against a loaded engine never corrupts other
    streams' counts."""
    eng = MultiStreamEngine(
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        ServerConfig(max_streams=8, max_batch=8, batch_timeout_ms=2.0,
                     min_request_interval=0.0),
        spec=_TINY_VIT)
    f = _noface_frame()
    stop = threading.Event()

    def resetter():
        while not stop.is_set():
            eng.reset("victim")

    t = threading.Thread(target=resetter)
    t.start()
    try:
        for i in range(1, 21):
            eng.analyze(f, "victim")
            r = eng.analyze(f, "steady")
            assert r["frame_count"] == i, (i, r)
    finally:
        stop.set()
        t.join()
    eng.shutdown()
