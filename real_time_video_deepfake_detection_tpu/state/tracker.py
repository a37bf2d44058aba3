"""Temporal voting tracker as a pure-JAX ring-buffer pytree.

Re-implements the verdict contract of the reference `TemporalTracker`
(deepfake_detection.py:93-289) as fixed-shape arrays + pure reducers so that
per-stream session state batches across N concurrent streams and updates run
as ONE jitted TPU step (vmap over the leading stream axis).

Reference semantics preserved exactly:
  - update(None) is a no-op (deepfake_detection.py:122-124) -> `valid` mask here
  - a frame votes FAKE iff prob STRICTLY > detection_threshold (:135)
  - verdict is UNCERTAIN until `voting_window` votes collected (:157-159)
  - then verdict = majority of last `voting_window` votes; tie -> REAL (:174-178)
  - temporal_average = mean(score_history) (:198-202), 0.0 when empty
  - stability = 0.0 if <10 scores else 1 - min(4*var, 1), population var (:214-221)
  - weighted_average uses linspace(0.5, 1.0, n) oldest->newest (:204-212)
  - anomaly score = min(10 * mean(variance_history), 1), 0 if <10 entries
    (:223-233); variance_history appends var(last 5 scores) once >=5 scores (:129-131)
  - reset clears everything (:270-289)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import TrackerConfig

VERDICT_UNCERTAIN = -1
VERDICT_REAL = 0
VERDICT_FAKE = 1

VERDICT_NAMES = {VERDICT_UNCERTAIN: "UNCERTAIN", VERDICT_REAL: "REAL", VERDICT_FAKE: "FAKE"}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackerState:
    """Per-stream tracker state. All fields are fixed-shape arrays, so a batch
    of streams is just this pytree with a leading axis (see `vmap`d reducers).
    """

    scores: jax.Array      # f32[window_size] ring buffer of fake probabilities
    n_scores: jax.Array    # i32[] valid count (saturates at window_size)
    score_pos: jax.Array   # i32[] next write index
    votes: jax.Array       # i8[voting_window] ring (1=FAKE, 0=REAL)
    n_votes: jax.Array     # i32[]
    vote_pos: jax.Array    # i32[]
    var_hist: jax.Array    # f32[variance_window] ring of 5-score variances
    n_var: jax.Array       # i32[]
    var_pos: jax.Array     # i32[]


def tracker_init(cfg: TrackerConfig = TrackerConfig()) -> TrackerState:
    return TrackerState(
        scores=jnp.zeros((cfg.window_size,), jnp.float32),
        n_scores=jnp.zeros((), jnp.int32),
        score_pos=jnp.zeros((), jnp.int32),
        votes=jnp.zeros((cfg.voting_window,), jnp.int8),
        n_votes=jnp.zeros((), jnp.int32),
        vote_pos=jnp.zeros((), jnp.int32),
        var_hist=jnp.zeros((cfg.variance_window,), jnp.float32),
        n_var=jnp.zeros((), jnp.int32),
        var_pos=jnp.zeros((), jnp.int32),
    )


def tracker_reset(state: TrackerState) -> TrackerState:
    """Functional reset (reference deepfake_detection.py:270-289)."""
    return jax.tree.map(jnp.zeros_like, state)


def _ordered_window(buf: jax.Array, n: jax.Array, pos: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Last min(n, k) entries of a ring buffer, oldest-first, plus a validity
    mask. `k` is static (<= buffer capacity)."""
    cap = buf.shape[0]
    m = jnp.minimum(n, k)
    # Indices of the last m entries, oldest first, padded on the left.
    i = jnp.arange(k)
    idx = jnp.mod(pos - m + i, cap)
    vals = buf[idx]
    mask = i < m
    return vals, mask


def _push(buf: jax.Array, n: jax.Array, pos: jax.Array, value, do: jax.Array):
    """Conditionally push `value` into the ring buffer. Returns new (buf, n, pos)."""
    cap = buf.shape[0]
    new_buf = buf.at[pos].set(jnp.asarray(value, buf.dtype))
    buf = jnp.where(do, new_buf, buf)
    n = jnp.where(do, jnp.minimum(n + 1, cap), n)
    pos = jnp.where(do, jnp.mod(pos + 1, cap), pos)
    return buf, n, pos


def tracker_update(
    state: TrackerState,
    fake_probability: jax.Array,
    valid: jax.Array = True,
    detection_threshold: float | jax.Array = 0.5,
) -> TrackerState:
    """Pure functional equivalent of TemporalTracker.update
    (deepfake_detection.py:120-144). `valid=False` reproduces the None-skip
    and doubles as the padded-slot mask under batching.
    """
    valid = jnp.asarray(valid, bool)
    prob = jnp.asarray(fake_probability, jnp.float32)

    scores, n_scores, score_pos = _push(
        state.scores, state.n_scores, state.score_pos, prob, valid
    )

    # Variance of the most recent 5 scores (appended once >=5 collected,
    # reference :129-131). Computed on the *post-push* history.
    recent, rmask = _ordered_window(scores, n_scores, score_pos, 5)
    rcount = jnp.maximum(jnp.sum(rmask), 1)
    rmean = jnp.sum(jnp.where(rmask, recent, 0.0)) / rcount
    rvar = jnp.sum(jnp.where(rmask, (recent - rmean) ** 2, 0.0)) / rcount
    push_var = valid & (n_scores >= 5)
    var_hist, n_var, var_pos = _push(state.var_hist, state.n_var, state.var_pos, rvar, push_var)

    # Strict > threshold (reference :135).
    vote = (prob > jnp.asarray(detection_threshold, jnp.float32)).astype(jnp.int8)
    votes, n_votes, vote_pos = _push(state.votes, state.n_votes, state.vote_pos, vote, valid)

    return TrackerState(
        scores=scores, n_scores=n_scores, score_pos=score_pos,
        votes=votes, n_votes=n_votes, vote_pos=vote_pos,
        var_hist=var_hist, n_var=n_var, var_pos=var_pos,
    )


def tracker_verdict(state: TrackerState) -> jax.Array:
    """Majority verdict (reference :146-196). Returns int32:
    -1 UNCERTAIN (window not yet full), 0 REAL (incl. tie), 1 FAKE."""
    cap = state.votes.shape[0]
    fake = jnp.sum(state.votes.astype(jnp.int32))
    real = state.n_votes - fake
    majority = jnp.where(fake > real, VERDICT_FAKE, VERDICT_REAL)
    return jnp.where(state.n_votes < cap, VERDICT_UNCERTAIN, majority).astype(jnp.int32)


def tracker_voting_stats(state: TrackerState) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(fake_count, real_count, total) — reference :260-268."""
    fake = jnp.sum(state.votes.astype(jnp.int32))
    total = state.n_votes
    return fake, total - fake, total


def tracker_temporal_average(state: TrackerState) -> jax.Array:
    """Running mean of score history; 0.0 when empty (reference :198-202)."""
    n = state.n_scores
    s = jnp.sum(jnp.where(jnp.arange(state.scores.shape[0]) < n, _chron(state), 0.0))
    return jnp.where(n == 0, 0.0, s / jnp.maximum(n, 1)).astype(jnp.float32)


def _chron(state: TrackerState) -> jax.Array:
    """Score history in chronological order (oldest first), padded at tail."""
    cap = state.scores.shape[0]
    i = jnp.arange(cap)
    idx = jnp.mod(state.score_pos - state.n_scores + i, cap)
    return state.scores[idx]


def tracker_weighted_average(state: TrackerState) -> jax.Array:
    """linspace(0.5, 1.0, n) recency weighting (reference :204-212)."""
    cap = state.scores.shape[0]
    n = state.n_scores
    vals = _chron(state)
    i = jnp.arange(cap, dtype=jnp.float32)
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    # np.linspace(0.5, 1.0, n): w_i = 0.5 + 0.5 * i/(n-1); n==1 -> 0.5
    w = jnp.where(n > 1, 0.5 + 0.5 * i / jnp.maximum(nf - 1.0, 1.0), 0.5)
    mask = jnp.arange(cap) < n
    num = jnp.sum(jnp.where(mask, vals * w, 0.0))
    den = jnp.sum(jnp.where(mask, w, 0.0))
    return jnp.where(n == 0, 0.0, num / jnp.maximum(den, 1e-30)).astype(jnp.float32)


def tracker_stability(state: TrackerState) -> jax.Array:
    """1 - min(4*var, 1); 0.0 below 10 scores (reference :214-221)."""
    cap = state.scores.shape[0]
    n = state.n_scores
    mask = jnp.arange(cap) < n
    vals = _chron(state)
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    mean = jnp.sum(jnp.where(mask, vals, 0.0)) / nf
    var = jnp.sum(jnp.where(mask, (vals - mean) ** 2, 0.0)) / nf
    stab = 1.0 - jnp.minimum(var * 4.0, 1.0)
    return jnp.where(n < 10, 0.0, stab).astype(jnp.float32)


def tracker_anomaly_score(state: TrackerState) -> jax.Array:
    """min(10 * mean(variance_history), 1); 0.0 below 10 entries (reference :223-233)."""
    cap = state.var_hist.shape[0]
    n = state.n_var
    mask = jnp.arange(cap) < n
    # variance_history is order-insensitive for its mean; no reordering needed.
    mean = jnp.sum(jnp.where(mask, state.var_hist, 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n < 10, 0.0, jnp.minimum(mean * 10.0, 1.0)).astype(jnp.float32)


# Batched reducers: one jitted call updates all streams at once.
tracker_update_batch = jax.vmap(tracker_update, in_axes=(0, 0, 0, None))
tracker_verdict_batch = jax.vmap(tracker_verdict)
tracker_temporal_average_batch = jax.vmap(tracker_temporal_average)
tracker_stability_batch = jax.vmap(tracker_stability)


def tracker_init_batch(n_streams: int, cfg: TrackerConfig = TrackerConfig()) -> TrackerState:
    one = tracker_init(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), one)


class TemporalTracker:
    """Single-stream convenience wrapper with the reference's Python API
    (deepfake_detection.py:93-289). Backed by the pure-JAX state above; the
    batched serving path uses the functional reducers directly.
    """

    def __init__(self, window_size: int = 60, high_confidence_threshold: float = 0.6,
                 voting_window: int = 10, detection_threshold: float = 0.5):
        self.cfg = TrackerConfig(
            window_size=window_size,
            voting_window=voting_window,
            detection_threshold=detection_threshold,
            high_confidence_threshold=high_confidence_threshold,
        )
        self.detection_threshold = detection_threshold
        self.high_confidence_threshold = high_confidence_threshold
        self.window_size = window_size
        self.voting_window = voting_window
        self.last_alert_time = 0.0
        self.alert_cooldown = self.cfg.alert_cooldown
        self.state = tracker_init(self.cfg)

    def update(self, fake_probability) -> None:
        if fake_probability is None:   # reference :122-124
            return
        self.state = _jit_update(self.state, float(fake_probability),
                                 float(self.detection_threshold))

    def _stats(self) -> tuple:
        return tuple(float(x) for x in _jit_stats(self.state))

    def get_confidence_level(self) -> str:
        return VERDICT_NAMES[int(self._stats()[0])]

    @property
    def current_verdict(self):
        v = int(self._stats()[0])
        return None if v == VERDICT_UNCERTAIN else VERDICT_NAMES[v]

    def get_temporal_average(self) -> float:
        return self._stats()[1]

    def get_weighted_average(self) -> float:
        return self._stats()[2]

    def get_stability_score(self) -> float:
        return self._stats()[3]

    def detect_anomalies(self) -> float:
        return self._stats()[4]

    def get_voting_stats(self) -> dict:
        s = self._stats()
        return {"fake_count": int(s[5]), "real_count": int(s[6]),
                "total_frames": int(s[7])}

    @property
    def history_length(self) -> int:
        return int(self.state.n_scores)

    def should_trigger_forensic_analysis(self, now: float | None = None) -> bool:
        """Forensic-trigger cooldown logic (reference :235-250). Wall-clock
        stays host-side; everything else reads the device state."""
        import time as _time
        if int(self.state.n_scores) < self.window_size // 2:
            return False
        now = _time.time() if now is None else now
        if (self.get_temporal_average() > self.high_confidence_threshold
                and self.get_stability_score() > 0.7
                and now - self.last_alert_time > self.alert_cooldown):
            self.last_alert_time = now
            return True
        return False

    def reset(self) -> None:
        self.state = tracker_reset(self.state)
        self.last_alert_time = 0.0


@jax.jit
def _jit_update(state: TrackerState, prob, threshold) -> TrackerState:
    return tracker_update(state, prob, True, threshold)


@jax.jit
def _jit_stats(state: TrackerState):
    fake, real, total = tracker_voting_stats(state)
    return (
        tracker_verdict(state),
        tracker_temporal_average(state),
        tracker_weighted_average(state),
        tracker_stability(state),
        tracker_anomaly_score(state),
        fake, real, total,
    )
