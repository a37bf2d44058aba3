"""The six forensic signals + full/fast analyzers as pure JAX functions.

Re-implements the scoring contract of the reference FrameForensicAnalyzer
(frame_analysis.py:22-395) as stateless functions over a (256,256,3) BGR u8
frame plus an explicit ForensicState pytree — batched across streams with
vmap, jitted as one fused TPU step. Heuristic step-scores are expressed as
jnp.where sums; all underlying image ops are bit-matched to cv2 (see
ops/color, ops/filters, ops/jpeg golden tests).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ForensicConfig
from ..state.forensic_state import ForensicState
from .color import bgr_to_gray_u8, bgr_to_hsv_u8
from .filters import gaussian_blur5_f32, laplacian4, canny
from .jpeg import jpeg_roundtrip_bgr
from .resize import resize_bilinear_u8_cv2


def _radial_masks(h: int, w: int):
    """Precomputed frequency band masks (frame_analysis.py:40-46)."""
    cy, cx = h // 2, w // 2
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    dist = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)
    inner = min(h, w) // 8
    mid = min(h, w) // 4
    outer = min(h, w) // 2
    low = dist <= inner
    midm = (dist > inner) & (dist <= mid)
    high = (dist > mid) & (dist <= outer)
    return jnp.asarray(low), jnp.asarray(midm), jnp.asarray(high)


def frequency_score(gray_f32: jax.Array) -> jax.Array:
    """FFT band-energy heuristic (frame_analysis.py:128-180)."""
    h, w = gray_f32.shape
    low_m, mid_m, high_m = _radial_masks(h, w)

    f = jnp.fft.fftshift(jnp.fft.fft2(gray_f32))
    mag = jnp.log1p(jnp.abs(f))

    def masked_mean(m):
        return jnp.sum(jnp.where(m, mag, 0.0)) / jnp.maximum(jnp.sum(m), 1)

    low = masked_mean(low_m)
    mid = masked_mean(mid_m)
    high = masked_mean(high_m)
    total = low + mid + high + 1e-10
    hfr = high / total
    mfr = mid / total

    mid_n = jnp.sum(mid_m)
    mid_mean = mid
    mid_var = jnp.sum(jnp.where(mid_m, (mag - mid_mean) ** 2, 0.0)) / jnp.maximum(mid_n, 1)
    mid_cv = jnp.sqrt(mid_var) / (mid_mean + 1e-10)

    score = jnp.where(hfr < 0.18, 0.4, jnp.where(hfr < 0.22, 0.2, 0.0))
    score += jnp.where(mid_cv > 0.6, 0.25, jnp.where(mid_cv > 0.45, 0.1, 0.0))
    score += jnp.where((mfr > 0.45) & (hfr < 0.2), 0.15, 0.0)
    return jnp.clip(score, 0.0, 1.0)


def _block_stats(x: jax.Array, block: int = 32) -> Tuple[jax.Array, jax.Array]:
    """Per-32x32-block (mean, population std) — the reference's Python block
    loops (frame_analysis.py:199-202, 250-253) as one reshape+reduce."""
    h, w = x.shape
    nb_h, nb_w = h // block, w // block
    b = x[:nb_h * block, :nb_w * block].reshape(nb_h, block, nb_w, block)
    mean = b.mean(axis=(1, 3))
    var = (b ** 2).mean(axis=(1, 3)) - mean ** 2
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return mean.reshape(-1), std.reshape(-1)


def noise_score(gray_f32: jax.Array) -> jax.Array:
    """Noise-consistency heuristic (frame_analysis.py:182-225)."""
    noise = gray_f32 - gaussian_blur5_f32(gray_f32)
    _, stds = _block_stats(noise, 32)
    mean_noise = stds.mean()
    noise_cv = stds.std() / (mean_noise + 1e-10)

    score = jnp.where(noise_cv > 0.7, 0.5, jnp.where(noise_cv > 0.5, 0.25, 0.0))
    score += jnp.where(mean_noise < 1.0, 0.3, jnp.where(mean_noise < 2.0, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)


def ela_score(frame_bgr_u8: jax.Array) -> jax.Array:
    """Error-level-analysis heuristic (frame_analysis.py:227-276). The JPEG
    q90 round-trip is bit-exact vs cv2 (see ops/jpeg.py)."""
    recompressed = jpeg_roundtrip_bgr(frame_bgr_u8, 90)
    diff = jnp.abs(frame_bgr_u8.astype(jnp.int32) - recompressed.astype(jnp.int32))
    diff_gray = bgr_to_gray_u8(jnp.clip(diff, 0, 255).astype(jnp.uint8)).astype(jnp.float32)
    means, _ = _block_stats(diff_gray, 32)
    ela_mean = means.mean()
    ela_cv = means.std() / (ela_mean + 1e-10)

    score = jnp.where(ela_cv > 0.9, 0.5, jnp.where(ela_cv > 0.6, 0.2, 0.0))
    score += jnp.where(ela_mean > 15, 0.2, jnp.where(ela_mean > 10, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)


def edge_score(gray_u8: jax.Array) -> jax.Array:
    """Edge-coherence heuristic (frame_analysis.py:278-309)."""
    edges = canny(gray_u8, 50, 150)
    density = jnp.mean((edges > 0).astype(jnp.float32))
    lap = laplacian4(gray_u8)
    lap_var = jnp.mean((lap - jnp.mean(lap)) ** 2)

    score = jnp.where(density < 0.02, 0.35, jnp.where(density < 0.04, 0.15, 0.0))
    score += jnp.where(lap_var < 50, 0.3, jnp.where(lap_var < 100, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)


def color_score(frame_bgr_u8: jax.Array) -> jax.Array:
    """Color-distribution heuristic (frame_analysis.py:311-347)."""
    hsv = bgr_to_hsv_u8(frame_bgr_u8)
    sat = hsv[..., 1].astype(jnp.float32)
    val = hsv[..., 2].astype(jnp.float32)
    sat_std = jnp.sqrt(jnp.maximum(jnp.mean(sat ** 2) - jnp.mean(sat) ** 2, 0.0))
    val_std = jnp.sqrt(jnp.maximum(jnp.mean(val ** 2) - jnp.mean(val) ** 2, 0.0))

    # Unique-hue count via presence BITSETS: each pixel contributes bit
    # (hue % 32) to word (hue // 32); six OR-reductions + popcount give the
    # distinct count. Implementation history (64-stream fused-program
    # timings on v5e): scatter-add histogram 118 ms (TPU scatters
    # serialize), jnp.sort 73 ms, per-bin loops ~70 ms of loop overhead,
    # dense/chunked one-hot compares 70+ ms (760M lane-misaligned int
    # compares); this form is ~1M ops per frame.
    hue = hsv[..., 0].astype(jnp.int32)
    bit = jnp.left_shift(jnp.int32(1), jnp.bitwise_and(hue, 31))
    group = jnp.right_shift(hue, 5)   # 0..5 covers hues 0..191
    unique_hues = jnp.int32(0)
    for g in range(6):
        word = jax.lax.reduce(
            jnp.where(group == g, bit, 0), jnp.int32(0),
            jax.lax.bitwise_or, (0, 1))
        unique_hues = unique_hues + jax.lax.population_count(word)

    score = jnp.where(sat_std < 15, 0.3, jnp.where(sat_std < 25, 0.1, 0.0))
    score += jnp.where(val_std < 15, 0.25, jnp.where(val_std < 25, 0.1, 0.0))
    score += jnp.where(unique_hues < 30, 0.25, jnp.where(unique_hues < 50, 0.1, 0.0))
    return jnp.clip(score, 0.0, 1.0)


def temporal_score(
    gray_f32: jax.Array, state: ForensicState, frame_count_post: jax.Array
) -> Tuple[jax.Array, ForensicState]:
    """Temporal-consistency heuristic + state evolution
    (frame_analysis.py:349-389). `frame_count_post` is the analyzer frame
    count AFTER this frame's increment (used by the >10 gates)."""
    diff = jnp.abs(gray_f32 - state.prev_gray)
    mean_diff = jnp.mean(diff)

    push = state.has_prev
    cap = state.diffs.shape[0]
    new_diffs = jnp.where(push, state.diffs.at[state.diff_pos].set(mean_diff), state.diffs)
    n_diffs = jnp.where(push, jnp.minimum(state.n_diffs + 1, cap), state.n_diffs)
    diff_pos = jnp.where(push, jnp.mod(state.diff_pos + 1, cap), state.diff_pos)

    mask = jnp.arange(cap) < n_diffs
    nf = jnp.maximum(n_diffs, 1).astype(jnp.float32)
    mean_diffs = jnp.sum(jnp.where(mask, new_diffs, 0.0)) / nf
    var = jnp.sum(jnp.where(mask, (new_diffs - mean_diffs) ** 2, 0.0)) / nf
    temporal_cv = jnp.sqrt(var) / (mean_diffs + 1e-10)

    score = jnp.where(temporal_cv > 1.5, 0.4, jnp.where(temporal_cv > 1.0, 0.2, 0.0))
    late = frame_count_post > 10
    score += jnp.where((mean_diff < 0.3) & late, 0.3,
                       jnp.where((mean_diff < 0.8) & late, 0.1, 0.0))
    score = jnp.clip(score, 0.0, 1.0)

    # First frame: no diff yet, score 0, just record prev (reference :358-360).
    score = jnp.where(state.has_prev & (n_diffs >= 5), score, 0.0)

    new_state = ForensicState(
        prev_gray=gray_f32,
        has_prev=jnp.ones((), bool),
        diffs=new_diffs, n_diffs=n_diffs, diff_pos=diff_pos,
        frame_count=frame_count_post,
    )
    return score, new_state


def analyze_frame(
    frame_bgr_u8: jax.Array,
    state: ForensicState,
    full: jax.Array,
    cfg: ForensicConfig = ForensicConfig(),
    color_score_override: jax.Array | None = None,
    fast_only: bool = False,
) -> Tuple[dict, ForensicState]:
    """One forensic step: `full=True` runs all six signals with the full
    weights (frame_analysis.py:58-101); `full=False` the fast trio with fast
    weights (:103-126). Both branches are computed and selected with `where`
    so the function stays trace-stable under jit/vmap; XLA dead-code-
    eliminates nothing here, which is the deliberate TPU tradeoff — the fast
    path exists in the reference to save *CPU* time, while on TPU the batched
    full computation is cheaper than divergent control flow. (The every-3rd-
    frame full/fast *weighting* semantics are preserved exactly.)

    `fast_only=True` (static) compiles a variant that SKIPS the full-only
    signals (noise/ELA/color report 0): the tick-level scheduling mode
    (serving/batcher.py device_step `forensic_fast_tick`) uses it on the
    2-of-3 ticks where no stream needs the full set.

    `frame_bgr_u8` must already be the resized analysis frame
    (cv2-parity resize: ops.resize.resize_bilinear_u8_cv2 to cfg.analysis_size).

    Returns (results, new_state); results has per-signal scores and the
    combined 'fake_probability'.
    """
    full = jnp.asarray(full, bool)
    frame_count_post = state.frame_count + 1

    gray_u8 = bgr_to_gray_u8(frame_bgr_u8)
    gray_f32 = gray_u8.astype(jnp.float32)

    s_freq = frequency_score(gray_f32)
    s_temporal, new_state = temporal_score(gray_f32, state, frame_count_post)
    s_edge = edge_score(gray_u8)
    if fast_only:
        # tick-level fast program: the full-only signals are never read by
        # the fast weighting, so skip their compute entirely
        s_noise = s_ela = s_color = jnp.zeros(())
    else:
        s_noise = noise_score(gray_f32)
        s_ela = ela_score(frame_bgr_u8)
        # The batched path precomputes color via the fused Pallas kernel
        # (kernels/color_stats.py) — every pure-XLA unique-hue formulation
        # is slow at batch scale on TPU (see that module's docstring).
        s_color = (color_score(frame_bgr_u8) if color_score_override is None
                   else color_score_override)

    full_combined = (s_freq * cfg.w_frequency + s_noise * cfg.w_noise
                     + s_ela * cfg.w_ela + s_edge * cfg.w_edge
                     + s_color * cfg.w_color + s_temporal * cfg.w_temporal)
    fast_combined = (s_freq * cfg.fast_w_frequency
                     + s_temporal * cfg.fast_w_temporal
                     + s_edge * cfg.fast_w_edge)
    combined = jnp.clip(jnp.where(full, full_combined, fast_combined), 0.0, 1.0)

    results = {
        "frequency": s_freq,
        "noise": s_noise,
        "ela": s_ela,
        "edge": s_edge,
        "color": s_color,
        "temporal": s_temporal,
        "fake_probability": combined,
        "full": full,
        "frame_number": frame_count_post,
    }
    return results, new_state


def analyze_frame_batch(frames, states, fulls, cfg: ForensicConfig = ForensicConfig(),
                        use_pallas_color: bool = False,
                        fast_only: bool = False):
    """vmap of analyze_frame over the stream axis (cfg broadcast). The color
    signal runs once for the whole batch through the fused Pallas kernel."""
    if use_pallas_color and not fast_only:
        # Retained as an option for host-attached TPU deployments. On the
        # axon remote runtime a Pallas custom call inside (or feeding) a big
        # program costs ~2 tunnel round-trips (~70 ms), so the default is
        # the pure-XLA bitset unique-hue count in color_score (sub-ms).
        from ..kernels.color_stats import color_scores_batch
        interpret = jax.default_backend() == "cpu"
        colors = color_scores_batch(frames, interpret=interpret)
        return jax.vmap(lambda f, s, fl, c: analyze_frame(f, s, fl, cfg, c))(
            frames, states, fulls, colors)
    return jax.vmap(lambda f, s, fl: analyze_frame(
        f, s, fl, cfg, fast_only=fast_only))(frames, states, fulls)


class FrameForensicAnalyzer:
    """Reference-API drop-in (frame_analysis.py:22-126, 391-395): the same
    constructor, `analyze` / `analyze_fast` / `reset` methods, `weights`
    attribute and return schema ({scores, fake_probability, analysis_type,
    frame_number}) — backed by the jitted signal kernels and the functional
    ForensicState instead of cv2 + mutable deques. A reference user's

        analyzer = FrameForensicAnalyzer()
        r = analyzer.analyze(frame_bgr)

    works unchanged (parity <= 1e-6, tests/test_forensics.py). This is the
    single-stream host convenience wrapper; batched serving goes through
    analyze_frame_batch."""

    def __init__(self, analysis_size=(256, 256)):
        from ..core.config import ForensicConfig
        from ..state.forensic_state import forensic_state_init
        self.analysis_size = tuple(analysis_size)
        self.cfg = ForensicConfig(analysis_size=self.analysis_size)
        self._state_init = lambda: forensic_state_init(self.cfg)
        self.state = self._state_init()
        # reference attribute (frame_analysis.py:49-56)
        self.weights = {
            "frequency": self.cfg.w_frequency, "noise": self.cfg.w_noise,
            "ela": self.cfg.w_ela, "edge": self.cfg.w_edge,
            "color": self.cfg.w_color, "temporal": self.cfg.w_temporal,
        }
        self._step = jax.jit(partial(analyze_frame, cfg=self.cfg))

    @property
    def frame_count(self) -> int:
        return int(jnp.asarray(self.state.frame_count))

    def _run(self, frame_bgr, full: bool) -> dict:
        from ..utils.host_resize import resize_analysis
        import numpy as np
        h, w = self.analysis_size
        resized = resize_analysis(np.ascontiguousarray(frame_bgr), h, w)
        res, self.state = self._step(jnp.asarray(resized), self.state,
                                     jnp.asarray(full))
        keys = (("frequency", "noise", "ela", "edge", "color", "temporal")
                if full else ("frequency", "temporal", "edge"))
        return {
            "scores": {k: float(res[k]) for k in keys},
            "fake_probability": float(res["fake_probability"]),
            "analysis_type": ("frame_forensic" if full
                              else "frame_forensic_fast"),
            "frame_number": int(res["frame_number"]),
        }

    def analyze(self, frame) -> dict:
        """All six signals, full weighting (frame_analysis.py:58-101)."""
        return self._run(frame, True)

    def analyze_fast(self, frame) -> dict:
        """Fast trio, fast weighting (frame_analysis.py:103-126)."""
        return self._run(frame, False)

    def reset(self) -> None:
        """(frame_analysis.py:391-395)."""
        self.state = self._state_init()
