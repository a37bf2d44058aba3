"""Verdict-contract tests for the pure-JAX TemporalTracker.

Covers the reference semantics (deepfake_detection.py:93-289) the same way
the reference's own tests do (tests/test_functional.py:223-305,
tests/test_algorithm.py:50-154): strict-> threshold incl. exact boundary,
UNCERTAIN-below-window, majority + tie->REAL, sliding window, None-skip,
reset, stability bounds — plus an exhaustive randomized cross-check against
a deque-based oracle and batched-vs-single equivalence.
"""

import collections

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.state import (
    TemporalTracker,
    tracker_init,
    tracker_update,
    tracker_verdict,
    tracker_temporal_average,
    tracker_weighted_average,
    tracker_stability,
    tracker_anomaly_score,
    VERDICT_UNCERTAIN,
    VERDICT_REAL,
    VERDICT_FAKE,
)
from real_time_video_deepfake_detection_tpu.state.tracker import (
    tracker_init_batch,
    tracker_update_batch,
    tracker_verdict_batch,
)
from real_time_video_deepfake_detection_tpu.core.config import TrackerConfig


class OracleTracker:
    """Independent deque-based oracle of the reference verdict contract."""

    def __init__(self, window_size=60, voting_window=10, threshold=0.5):
        self.scores = collections.deque(maxlen=window_size)
        self.votes = collections.deque(maxlen=voting_window)
        self.var_hist = collections.deque(maxlen=30)
        self.voting_window = voting_window
        self.threshold = threshold

    def update(self, p):
        if p is None:
            return
        self.scores.append(p)
        if len(self.scores) >= 5:
            self.var_hist.append(np.var(list(self.scores)[-5:]))
        self.votes.append(1 if p > self.threshold else 0)

    def verdict(self):
        if len(self.votes) < self.voting_window:
            return VERDICT_UNCERTAIN
        fake = sum(self.votes)
        return VERDICT_FAKE if fake > len(self.votes) - fake else VERDICT_REAL

    def temporal_average(self):
        return sum(self.scores) / len(self.scores) if self.scores else 0.0

    def weighted_average(self):
        if not self.scores:
            return 0.0
        s = list(self.scores)
        w = np.linspace(0.5, 1.0, len(s))
        return float(sum(a * b for a, b in zip(s, w)) / sum(w))

    def stability(self):
        if len(self.scores) < 10:
            return 0.0
        v = np.var(list(self.scores))
        return 1.0 - min(v * 4.0, 1.0)

    def anomaly(self):
        if len(self.var_hist) < 10:
            return 0.0
        return min(float(np.mean(self.var_hist)) * 10.0, 1.0)


def test_uncertain_until_window_full():
    t = TemporalTracker(voting_window=10, detection_threshold=0.5)
    for i in range(9):
        t.update(0.9)
        assert t.get_confidence_level() == "UNCERTAIN", f"frame {i}"
        assert t.current_verdict is None
    t.update(0.9)
    assert t.get_confidence_level() == "FAKE"


def test_strict_threshold_boundary():
    # prob == threshold votes REAL (strict >, reference :135)
    t = TemporalTracker(voting_window=10, detection_threshold=0.55)
    for _ in range(10):
        t.update(0.55)
    assert t.get_confidence_level() == "REAL"
    t2 = TemporalTracker(voting_window=10, detection_threshold=0.55)
    for _ in range(10):
        t2.update(0.550001)
    assert t2.get_confidence_level() == "FAKE"


def test_tie_goes_real():
    t = TemporalTracker(voting_window=10, detection_threshold=0.5)
    for p in [0.9] * 5 + [0.1] * 5:
        t.update(p)
    assert t.get_confidence_level() == "REAL"


def test_majority_and_sliding_window():
    t = TemporalTracker(voting_window=10, detection_threshold=0.5)
    for p in [0.9] * 6 + [0.1] * 4:
        t.update(p)
    assert t.get_confidence_level() == "FAKE"
    # Slide: 6 more REAL votes push FAKEs out
    for _ in range(6):
        t.update(0.1)
    assert t.get_confidence_level() == "REAL"


def test_none_skip():
    t = TemporalTracker(voting_window=10)
    for _ in range(10):
        t.update(0.9)
        t.update(None)
    assert t.get_confidence_level() == "FAKE"
    assert t.get_voting_stats()["total_frames"] == 10


def test_reset():
    t = TemporalTracker()
    for _ in range(20):
        t.update(0.9)
    assert t.get_confidence_level() == "FAKE"
    t.reset()
    assert t.get_confidence_level() == "UNCERTAIN"
    assert t.get_temporal_average() == 0.0
    assert t.get_stability_score() == 0.0
    assert t.get_voting_stats() == {"fake_count": 0, "real_count": 0, "total_frames": 0}


def test_voting_stats():
    t = TemporalTracker(voting_window=10, detection_threshold=0.5)
    for p in [0.9, 0.9, 0.9, 0.1, 0.1]:
        t.update(p)
    assert t.get_voting_stats() == {"fake_count": 3, "real_count": 2, "total_frames": 5}


def test_stability_bounds_and_gating():
    t = TemporalTracker()
    for _ in range(9):
        t.update(0.5)
    assert t.get_stability_score() == 0.0  # gated below 10 scores
    t.update(0.5)
    assert t.get_stability_score() == pytest.approx(1.0)  # zero variance
    t2 = TemporalTracker()
    for i in range(20):
        t2.update(float(i % 2))  # alternating 0/1 -> var 0.25 -> stability 0
    assert 0.0 <= t2.get_stability_score() <= 1.0
    assert t2.get_stability_score() == pytest.approx(0.0, abs=1e-6)


def test_randomized_against_oracle():
    rng = np.random.default_rng(42)
    t = TemporalTracker(window_size=60, voting_window=10, detection_threshold=0.55)
    o = OracleTracker(window_size=60, voting_window=10, threshold=0.55)
    for step in range(200):
        p = None if rng.random() < 0.1 else float(rng.random())
        t.update(p)
        o.update(p)
        assert int(tracker_verdict(t.state)) == o.verdict(), f"step {step}"
        assert t.get_temporal_average() == pytest.approx(o.temporal_average(), abs=1e-5)
        assert t.get_weighted_average() == pytest.approx(o.weighted_average(), abs=1e-5)
        assert t.get_stability_score() == pytest.approx(o.stability(), abs=1e-5)
        assert t.detect_anomalies() == pytest.approx(o.anomaly(), abs=1e-5)


@pytest.mark.slow
def test_batched_matches_single():
    """A vmapped batch of streams must evolve identically to independent
    single-stream trackers (padding slots masked via valid=False)."""
    n_streams, steps = 8, 80
    rng = np.random.default_rng(0)
    probs = rng.random((steps, n_streams)).astype(np.float32)
    valid = rng.random((steps, n_streams)) > 0.2

    batch = tracker_init_batch(n_streams)
    singles = [tracker_init() for _ in range(n_streams)]

    step_fn = jax.jit(tracker_update_batch)
    for s in range(steps):
        batch = step_fn(batch, jnp.asarray(probs[s]), jnp.asarray(valid[s]), 0.5)
        for k in range(n_streams):
            singles[k] = tracker_update(singles[k], probs[s, k], bool(valid[s, k]), 0.5)

    bv = np.asarray(tracker_verdict_batch(batch))
    for k in range(n_streams):
        assert bv[k] == int(tracker_verdict(singles[k]))
        np.testing.assert_allclose(
            np.asarray(jax.vmap(tracker_temporal_average)(batch))[k],
            float(tracker_temporal_average(singles[k])), atol=1e-6)


def test_update_is_jittable_with_no_recompile():
    cfg = TrackerConfig()
    state = tracker_init(cfg)
    f = jax.jit(tracker_update, static_argnums=())
    for p in [0.1, 0.9, 0.5]:
        state = f(state, jnp.float32(p), True, 0.5)
    assert int(state.n_scores) == 3
