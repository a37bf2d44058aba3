"""Batched multi-stream device step — the TPU serving core.

The reference serves ONE stream with global mutable state
(backend_server.py:57-80). Here N concurrent streams multiplex into a single
jitted TPU program per tick (BASELINE config 4):

  frames (N,H,W,3 u8) -> resize 256 -> six forensic signals  \
  faces  (N,160,160,3 f32) -> classify (EfficientNet, MXU)    } one XLA program
  vote = face prob if face else forensic prob                /
  tracker ring-buffer update + verdict (pure reducers)

Padded slots are masked with `active=False` — their tracker/forensic state
update is a no-op, preserving per-stream semantics exactly (verified against
the single-stream path in tests). Host work per tick is only JPEG decode and
face-box extraction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import DetectorConfig
from ..models import backbones
from ..ops import forensics
from ..ops.resize import resize_bilinear_u8_cv2
from ..pipeline.classify import preprocess_aligned
from ..models.temporal_head import (
    ClipState, TemporalHeadSpec, clip_state_push, clip_verdict,
)
from ..state.forensic_state import ForensicState, forensic_state_init_batch
from ..state.tracker import (
    TrackerState, VERDICT_FAKE, VERDICT_REAL, VERDICT_UNCERTAIN,
    tracker_init_batch, tracker_update, tracker_verdict,
    tracker_temporal_average, tracker_stability,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamStates:
    forensic: ForensicState   # batched (leading stream axis)
    tracker: TrackerState     # batched
    frame_count: jax.Array    # i32[N] server-semantics per-stream frame count
    # Clip-attention mode (BASELINE config 5): per-stream ring of backbone
    # features. Allocated (1,1)-tiny when cfg.clip_window == 0.
    clip: ClipState


def clip_head_spec(cfg: DetectorConfig) -> TemporalHeadSpec:
    return TemporalHeadSpec(feature_dim=cfg.clip_feature_dim,
                            window=max(cfg.clip_window, 1))


def init_stream_states(n_streams: int, cfg: DetectorConfig = DetectorConfig()) -> StreamStates:
    window = max(cfg.clip_window, 1)
    fdim = cfg.clip_feature_dim if cfg.clip_window > 0 else 1
    return StreamStates(
        forensic=forensic_state_init_batch(n_streams, cfg.forensic),
        tracker=tracker_init_batch(n_streams, cfg.tracker),
        frame_count=jnp.zeros((n_streams,), jnp.int32),
        clip=ClipState(
            feats=jnp.zeros((n_streams, window, fdim), jnp.float32),
            n=jnp.zeros((n_streams,), jnp.int32),
            pos=jnp.zeros((n_streams,), jnp.int32)),
    )


def reset_streams(states: StreamStates, mask: jax.Array) -> StreamStates:
    """Reset the streams selected by mask (per-stream /reset)."""
    zero = jax.tree.map(jnp.zeros_like, states)

    def sel(z, s):
        m = mask.reshape((-1,) + (1,) * (s.ndim - 1))
        return jnp.where(m, z, s)

    return jax.tree.map(sel, zero, states)


def _step_core(spec, cfg: DetectorConfig, params,
               frames_u8: jax.Array, faces_raw: jax.Array,
               has_face: jax.Array, face_hw: jax.Array,
               active: jax.Array, states: StreamStates):
    """One tick over all streams.

    frames_u8: (N,256,256,3) u8 — analysis-size frames (resized on host or
        by resize_frames_on_device for fixed capture sizes)
    faces_raw: (N,160,160,3) f32 or u8 — aligned face crops, raw RGB 0-255
        (zeros for streams without faces). u8 halves host->device traffic
        and is exact when the aligner output is integer-valued (the resize
        aligner's is); the engine auto-falls back to f32 for MTCNN's
        fractional crops.
    has_face:  bool[N]; face_hw: i32[N,2] original crop size (heuristic)
    active:    bool[N] — padded-slot mask
    """
    n = frames_u8.shape[0]

    # Server off-by-one semantics: forensics scheduled on the PRE-increment
    # count (backend_server.py:148-156). Tick-schedule variants force one
    # branch for every stream (cfg.forensic_schedule docstring).
    if cfg.forensic_schedule == "tick_fast":
        full = jnp.zeros((n,), bool)
    elif cfg.forensic_schedule == "tick_full":
        full = jnp.ones((n,), bool)
    elif cfg.forensic_schedule == "frame":
        full = jnp.mod(states.frame_count, cfg.full_forensic_interval) == 0
    else:
        raise ValueError(
            f"unknown forensic_schedule {cfg.forensic_schedule!r} "
            "(expected 'frame', 'tick_full' or 'tick_fast')")

    fres, new_forensic = forensics.analyze_frame_batch(
        frames_u8, states.forensic, full, cfg.forensic,
        use_pallas_color=cfg.use_pallas_color,
        fast_only=cfg.forensic_schedule == "tick_fast")
    # inactive slots keep their old forensic state
    new_forensic = jax.tree.map(
        lambda new, old: jnp.where(
            active.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
        new_forensic, states.forensic)
    forensic_prob = fres["fake_probability"]

    if cfg.clahe_device:
        # Device-side CLAHE on the aligned crop (Pallas per-tile histogram
        # kernel, kernels/clahe.py) instead of host CLAHE on the pre-align
        # crop. Commutes CLAHE with the align resize — an approximation of
        # preprocess_face_quality (deepfake_detection.py:357-370), offered
        # for 1-core hosts where per-face host CLAHE is the bottleneck;
        # requires u8 faces (resize-aligner mode, enforced by the engine).
        from ..ops.clahe import clahe_u8_batch
        from ..ops.color import lab_to_rgb_u8, rgb_to_lab_u8
        lab = rgb_to_lab_u8(faces_raw)
        # clahe_u8_batch: the batched one-hot-matmul formulation — measured
        # 3x faster than the vmapped Pallas kernel on v5e at batch 64
        # (27 -> ~8 ms/tick; per-pixel gathers and scatter histograms are
        # 4-20x worse, ops/clahe.py docstring) and runs unmodified on CPU.
        L = clahe_u8_batch(lab[..., 0])
        faces_raw = lab_to_rgb_u8(
            jnp.stack([L, lab[..., 1], lab[..., 2]], axis=-1))

    if cfg.use_pallas_preproc:
        from ..kernels.preproc import preprocess_faces_pallas
        x = preprocess_faces_pallas(faces_raw.astype(jnp.float32),
                                    cfg.model_input_size)
    else:
        # u8 faces keep their dtype: preprocess_aligned's u8 fast path runs
        # the horizontal resize taps as exact one-hot matmuls
        x = jax.vmap(lambda f: preprocess_aligned(
            f, cfg.model_input_size))(faces_raw)
    # clip mode: params = {"backbone": pytree, "clip_head": head pytree};
    # the classifier dispatches on the spec type (models/backbones.py), so
    # the same tick serves EfficientNet, ViT, or Xception backbones.
    backbone = params["backbone"] if cfg.clip_window > 0 else params
    if cfg.bf16_inference:
        p16 = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, backbone)
        feats = backbones.extract_features(p16, x.astype(jnp.bfloat16), spec)
        logits = backbones.apply_head(p16, feats, spec)
        face_prob = jax.nn.sigmoid(logits[:, 0].astype(jnp.float32))
    else:
        feats = backbones.extract_features(backbone, x, spec)
        logits = backbones.apply_head(backbone, feats, spec)
        face_prob = jax.nn.sigmoid(logits[:, 0])
    if cfg.calibrator_knots is not None:
        # isotonic calibration between sigmoid and the small-face heuristic
        # — the reference's apply_calibration-then-apply_heuristics order
        # (deepfake_detection.py:535-538); knots are compiled-in constants
        cx = jnp.asarray(cfg.calibrator_knots[0], jnp.float32)
        cy = jnp.asarray(cfg.calibrator_knots[1], jnp.float32)
        face_prob = jnp.interp(face_prob, cx, cy)
    small = (face_hw[:, 0] < cfg.small_face_px) | (face_hw[:, 1] < cfg.small_face_px)
    face_prob = jnp.clip(
        face_prob + jnp.where(small, cfg.small_face_boost, 0.0), 0.0, 1.0)

    if cfg.fuse_forensics:
        fused = cfg.face_weight * face_prob + cfg.forensic_weight * forensic_prob
    else:
        fused = face_prob   # reference default (deepfake_detection.py:620-623)
    vote_prob = jnp.where(has_face, fused, forensic_prob)

    new_tracker = jax.vmap(tracker_update, in_axes=(0, 0, 0, None))(
        states.tracker, vote_prob, active, cfg.detection_threshold)
    verdict = jax.vmap(tracker_verdict)(new_tracker)
    temporal_avg = jax.vmap(tracker_temporal_average)(new_tracker)
    stability = jax.vmap(tracker_stability)(new_tracker)

    new_clip = states.clip
    if cfg.clip_window > 0:
        # Clip-attention verdict (BASELINE config 5): push this frame's
        # backbone features into the per-stream ring, score the window with
        # the temporal-attention head, and REPLACE the majority vote.
        hspec = clip_head_spec(cfg)
        new_clip = jax.vmap(clip_state_push)(
            states.clip, feats.astype(jnp.float32), has_face & active)
        clip_prob = jax.vmap(lambda s: clip_verdict(
            params["clip_head"], s, hspec))(new_clip)
        # the ring caps n at clip_window, so a window smaller than
        # clip_min_frames must still eventually leave UNCERTAIN
        min_frames = min(cfg.clip_min_frames, cfg.clip_window)
        verdict = jnp.where(
            new_clip.n >= min_frames,
            jnp.where(clip_prob > cfg.detection_threshold,
                      VERDICT_FAKE, VERDICT_REAL),
            VERDICT_UNCERTAIN)

    new_counts = states.frame_count + active.astype(jnp.int32)

    out = {
        "fake_probability": jnp.where(has_face, face_prob, forensic_prob),
        "face_probability": face_prob,
        "frame_forensic_probability": forensic_prob,
        "verdict": verdict,
        "temporal_average": temporal_avg,
        "stability_score": stability,
        "frame_count": new_counts,
        "full_forensic": full,
    }
    if cfg.clip_window > 0:
        out["clip_probability"] = clip_prob
        out["clip_frames"] = new_clip.n
    return out, StreamStates(new_forensic, new_tracker, new_counts, new_clip)


device_step = partial(jax.jit, static_argnums=(0, 1))(_step_core)


@partial(jax.jit, static_argnums=(0, 1))
def device_step_compact(spec, cfg: DetectorConfig, params,
                        frames_u8: jax.Array, faces_raw: jax.Array,
                        has_face: jax.Array, face_hw: jax.Array,
                        active: jax.Array, slot_idx: jax.Array,
                        states: StreamStates):
    """Occupancy-bucketed tick: inputs carry only B <= N_slots entries
    (B static per bucket), `slot_idx` maps each entry to its stream slot in
    the full state pytree. Cuts host->device transfer by the occupancy
    ratio — the transfer, not the FLOPs, bounds the tick on PCIe-remote
    runtimes. Padded entries use the dummy slot (row N) with active=False:
    their state update is a no-op, so duplicate dummy scatters write
    identical values.

    states must have N_slots + 1 rows (the engine allocates the dummy row).
    """
    sub = jax.tree.map(lambda s: s[slot_idx], states)
    out, new_sub = _step_core(spec, cfg, params, frames_u8, faces_raw,
                              has_face, face_hw, active, sub)
    new_full = jax.tree.map(
        lambda full, ns: full.at[slot_idx].set(ns), states, new_sub)
    return out, new_full


def make_device_step_detect(net, spec, cfg: DetectorConfig,
                            mtcnn_params=None):
    """ONE XLA program per tick for the full capture->verdict path
    (round-2 verdict #1: face detection batched into the serving tick):

      frames (B, Hc, Wc, 3 u8 BGR, capture size)
        -> cv2-parity resize 300 + mean-sub -> SSD-Res10 Caffe graph ->
           DetectionOutput decode + NMS -> reference box selection
           (conf > 0.5, clamp, min 20 px; face_detection.py:71-105)
        -> cv2-parity resize 256 -> six forensic signals
        -> per-stream dynamic crop + cv2-parity align resize 160 (RGB)
           [+ device CLAHE when cfg.clahe_device]
           [-> batched MTCNN P/R/O alignment when cfg.mtcnn_device]
        -> classifier -> small-face heuristic -> tracker update -> verdict

    `net` is the compiled Caffe graph (models/caffe_net.CaffeNet). Uses the
    compact slot-indexed state layout (see device_step_compact): inputs
    carry B <= N_slots entries, slot_idx maps to rows of the (N_slots+1)-row
    state pytree, padded entries target the dummy row with active=False.

    Alignment: by default this pairs with the resize aligner. With
    cfg.mtcnn_device (and converted facenet weights in `mtcnn_params`), the
    reference's FULL face path runs in the tick in the reference's order —
    SSD crop -> CLAHE (when cfg.clahe_device) -> MTCNN align -> classify
    (deepfake_detection.py:357-398) — with the cascade seeing the crop
    resized to mtcnn_image_size (static pyramid; documented deviation). A
    stream whose crop fails the cascade falls to forensic-only, exactly
    like the reference's `mtcnn(img) is None` branch.
    """
    detect_prep, step_cfg = _make_detect_prep(net, cfg, mtcnn_params)

    @jax.jit
    def step(params, frames_capture_u8, active, slot_idx, states):
        return _detect_tick(detect_prep, spec, step_cfg, params,
                            frames_capture_u8, active, slot_idx, states)

    return step


def _detect_tick(detect_prep, spec, step_cfg, params, frames_capture_u8,
                 active, slot_idx, states):
    """Shared compact-layout detect-tick body (capture frames already on
    device): detection/forensics/align/classify/tracker, slot-indexed state
    gather/scatter with a dummy row for padding."""
    (frames_256, faces_raw, has_face, face_hw, box,
     n_faces) = detect_prep(frames_capture_u8, active)
    sub = jax.tree.map(lambda s: s[slot_idx], states)
    out, new_sub = _step_core(spec, step_cfg, params, frames_256,
                              faces_raw, has_face, face_hw, active, sub)
    new_full = jax.tree.map(
        lambda full, ns: full.at[slot_idx].set(ns), states, new_sub)
    out["face_bbox"] = box
    out["has_face"] = has_face
    out["faces_detected"] = n_faces
    return out, new_full


def make_device_step_detect_wire(net, spec, cfg: DetectorConfig, wire: str,
                                 capture_hw: Tuple[int, int],
                                 mtcnn_params=None):
    """Device-detect tick fed by a wire-format ingest plane instead of
    decoded BGR frames (ServerConfig.ingest_plane; reference equivalent:
    backend_server.py:140-142 always full-decodes on host). The JPEG codec
    is split at a natural boundary and finished ON DEVICE with the
    bit-exact libjpeg integer math from ops/jpeg_decode.py:

      wire="coef":     inputs (coef_y i16 (B, yb, 64),
                       coef_c i16 (B, 2, yb/4, 64), qtab u16 (B, 2, 64));
                       device runs dequant -> islow IDCT -> fancy upsample
                       -> YCbCr->BGR -> the normal detect tick. Host cost
                       per frame collapses to the entropy scan.
      wire="ycbcr420": inputs (y u8 (B, H, W), c u8 (B, 2, H/2, W/2));
                       device runs upsample + color only. The wire carries
                       1.5 B/px (half of BGR) — for transfer-bound links.

    Inactive rows may carry GARBAGE wire data (the pooled host decode
    flags ineligible entries instead of compacting the batch): int-only
    math cannot produce NaN, outputs clamp, and active=False masks every
    state update, so garbage rows are dead weight, not corruption.
    """
    from ..ops.jpeg_decode import bgr_from_coefs_420, bgr_from_ycbcr420

    detect_prep, step_cfg = _make_detect_prep(net, cfg, mtcnn_params)
    hc, wc = capture_hw

    if wire == "coef":
        @jax.jit
        def step(params, coef_y, coef_c, qtab, active, slot_idx, states):
            frames = bgr_from_coefs_420(coef_y, coef_c, qtab, hc, wc)
            return _detect_tick(detect_prep, spec, step_cfg, params, frames,
                                active, slot_idx, states)
        return step
    if wire == "ycbcr420":
        @jax.jit
        def step(params, y, c, active, slot_idx, states):
            frames = bgr_from_ycbcr420(y, c)
            return _detect_tick(detect_prep, spec, step_cfg, params, frames,
                                active, slot_idx, states)
        return step
    raise ValueError(f"unknown ingest wire plane: {wire!r}")


def _make_detect_prep(net, cfg: DetectorConfig, mtcnn_params=None):
    """The capture->(frames_256, faces, flags, boxes) stage of the detect
    tick, shared by the single-chip and sharded step builders. Returns
    (detect_prep, step_cfg) — step_cfg is cfg with clahe_device forced off
    when the MTCNN path applies CLAHE itself (the reference's
    CLAHE-then-align order), so the core step never re-applies it."""
    from ..models.ssd_res10 import detect_postprocess_batch
    from ..ops.resize import crop_resize_u8_cv2

    h256, w256 = cfg.forensic.analysis_size
    m = cfg.mtcnn_image_size
    if cfg.mtcnn_device:
        if mtcnn_params is None:
            raise ValueError("cfg.mtcnn_device requires mtcnn_params "
                             "(converted facenet P/R/O-Net weights)")
        from ..models.mtcnn import mtcnn_align_batch
        # CLAHE (when enabled) runs BEFORE alignment inside detect_prep —
        # the reference's order — so the core step must not re-apply it.
        step_cfg = dataclasses.replace(cfg, clahe_device=False)
    else:
        step_cfg = cfg

    if cfg.ssd_bf16:
        # cast the Caffe graph's conv weights once at build time; the graph
        # runs bf16 end-to-end until DetectionOutput decodes in f32 (only
        # the traced net._forward call below matters — the copy's public
        # forward() path is never used)
        import copy

        import numpy as np
        net = copy.copy(net)
        net.weights = {
            k: [np.asarray(b, np.float32).astype(jnp.bfloat16)
                if np.asarray(b).dtype in (np.float32, np.float64) else b
                for b in bl]
            for k, bl in net.weights.items()}

    def detect_prep(frames_capture_u8, active):
        hc, wc = frames_capture_u8.shape[1], frames_capture_u8.shape[2]
        # (a fused 300+256 horizontal matmul was tried and measured level
        # with the two separate resizes — XLA already shares the f32
        # conversion; keeping the simpler form)
        resized300 = jax.vmap(
            lambda f: resize_bilinear_u8_cv2(f, 300, 300))(frames_capture_u8)
        frames_256 = jax.vmap(
            lambda f: resize_bilinear_u8_cv2(f, h256, w256))(frames_capture_u8)
        blob = resized300.astype(jnp.float32) - jnp.asarray(
            [104.0, 177.0, 123.0], jnp.float32)
        if cfg.ssd_bf16:
            blob = blob.astype(jnp.bfloat16)
        det = net._forward(jnp.transpose(blob, (0, 3, 1, 2)))["detection_out"]
        det = det.astype(jnp.float32)
        d = detect_postprocess_batch(det, hc, wc,
                                     cfg.ssd_confidence_threshold,
                                     cfg.min_face_px)
        box = d["box_xywh"]
        has_face = d["has_face"] & active
        # BGR frame -> RGB aligned crop (the host aligner's channel order,
        # pipeline/detector._ResizeAligner). The channel flip runs on the
        # (m, m) CROP, not the full capture frame: crop_resize_u8_cv2
        # treats channels uniformly so the flip commutes bit-exactly, and
        # flipping after shrinks the reversed bytes 12x (the full-frame rev
        # was 685 us/tick = 3.7% of the device tick in the round-5 roofline
        # trace, tools/roofline_probe.py)
        faces_raw = jax.vmap(
            lambda f, b: crop_resize_u8_cv2(f, b, m, m)[:, :, ::-1]
        )(frames_capture_u8, box)
        face_hw = jnp.stack([box[:, 3], box[:, 2]], axis=1)  # (fh, fw)
        if cfg.mtcnn_device:
            if cfg.clahe_device:
                # reference order: CLAHE on the crop, THEN MTCNN alignment
                # (preprocess_face_quality before mtcnn(),
                # deepfake_detection.py:357-383)
                from ..ops.clahe import clahe_u8_batch
                from ..ops.color import lab_to_rgb_u8, rgb_to_lab_u8
                lab = rgb_to_lab_u8(faces_raw)
                L = clahe_u8_batch(lab[..., 0])
                faces_raw = lab_to_rgb_u8(jnp.stack(
                    [L, lab[..., 1], lab[..., 2]], axis=-1))
            mp, mr, mo = cfg.mtcnn_tick_caps
            mfaces, mscores, _mboxes = mtcnn_align_batch(
                mtcnn_params, faces_raw.astype(jnp.float32),
                image_size=m, max_p=mp, max_r=mr, max_o=mo)
            # cascade found no face in the crop -> forensic-only, the
            # reference's `mtcnn(img) is None` branch (:379-381)
            has_face = has_face & (mscores > 0.0)
            faces_raw = mfaces
        return frames_256, faces_raw, has_face, face_hw, box, d["n_faces"]

    return detect_prep, step_cfg


def make_sharded_device_step_detect(mesh, net, spec, cfg: DetectorConfig,
                                    mtcnn_params=None, wire: str = None,
                                    capture_hw: Tuple[int, int] = None):
    """Multi-chip device-detect tick over a ("data",) mesh: the STREAM axis
    of frames/state is partitioned across chips — each chip runs SSD
    detection, forensics, crop/align(/CLAHE) and classification for its
    shard of streams. SSD and classifier weights replicate; like
    make_sharded_device_step there is no cross-stream dataflow, so XLA
    emits zero steady-state collectives and aggregate capture->verdict
    throughput scales linearly with chips. Uses the dense (non-compact)
    layout: states row i belongs to entry i; n_streams must divide by the
    mesh size. Exercised on the virtual CPU mesh by the driver dryrun.

    wire="coef"/"ycbcr420" (with capture_hw) makes the step consume a
    wire-format ingest plane instead of decoded BGR frames: each chip
    finishes the JPEG decode for ITS shard of streams on device
    (ops/jpeg_decode.py) — the per-stream wire tensors shard on the same
    stream axis, so the split costs no collectives either."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    detect_prep, step_cfg = _make_detect_prep(net, cfg, mtcnn_params)

    def _finish(params, frames_capture_u8, active, states):
        (frames_256, faces_raw, has_face, face_hw, box,
         n_faces) = detect_prep(frames_capture_u8, active)
        out, new_states = _step_core(spec, step_cfg, params, frames_256,
                                     faces_raw, has_face, face_hw, active,
                                     states)
        out["face_bbox"] = box
        out["has_face"] = has_face
        out["faces_detected"] = n_faces
        return out, new_states

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    if wire is None:
        return jax.jit(_finish, in_shardings=(repl, data, data, data),
                       out_shardings=(data, data))
    from ..ops.jpeg_decode import bgr_from_coefs_420, bgr_from_ycbcr420
    hc, wc = capture_hw
    if wire == "coef":
        def body(params, coef_y, coef_c, qtab, active, states):
            frames = bgr_from_coefs_420(coef_y, coef_c, qtab, hc, wc)
            return _finish(params, frames, active, states)
        n_wire = 3
    elif wire == "ycbcr420":
        def body(params, y, c, active, states):
            frames = bgr_from_ycbcr420(y, c)
            return _finish(params, frames, active, states)
        n_wire = 2
    else:
        raise ValueError(f"unknown ingest wire plane: {wire!r}")
    return jax.jit(body,
                   in_shardings=(repl,) + (data,) * n_wire + (data, data),
                   out_shardings=(data, data))


@partial(jax.jit, static_argnums=(1, 2))
def resize_frames_on_device(frames_u8: jax.Array, h: int = 256, w: int = 256):
    """(N,H,W,3) u8 -> (N,256,256,3) u8, cv2-parity resize, on device."""
    return jax.vmap(lambda f: resize_bilinear_u8_cv2(f, h, w))(frames_u8)


@partial(jax.jit, static_argnums=(0, 1))
def device_step_from_capture(spec, cfg: DetectorConfig,
                             params, frames_capture_u8: jax.Array,
                             faces_raw: jax.Array, has_face: jax.Array,
                             face_hw: jax.Array, active: jax.Array,
                             states: StreamStates):
    """device_step with the capture->analysis resize fused in (ONE program
    per tick — cross-program dependencies cost a round-trip on remote
    runtimes). frames_capture_u8: (N, H, W, 3) at the capture resolution."""
    h, w = cfg.forensic.analysis_size
    small = jax.vmap(lambda f: resize_bilinear_u8_cv2(f, h, w))(frames_capture_u8)
    return device_step(spec, cfg, params, small, faces_raw, has_face,
                       face_hw, active, states)


def make_sharded_device_step(mesh, spec,
                             cfg: DetectorConfig):
    """Serving tick sharded over a ("data",) mesh: the STREAM axis is
    partitioned across chips — each chip runs resize+forensics+classify+
    tracker for its shard of streams, params replicated. There is no
    cross-stream dataflow inside a tick, so XLA emits zero collectives in
    steady state (the ICI only carries the one-time replicated-param
    broadcast): aggregate throughput scales linearly with chips. Multi-chip
    serving analogue of train/steps.make_sharded_train_step; exercised on
    the virtual CPU mesh by tests/test_multi_stream.py and the driver
    dryrun.

    Returns step(params, frames_u8, faces_raw, has_face, face_hw, active,
    states) -> (out, new_states); n_streams must be divisible by the mesh
    size, and inputs should be placed with `serving_shardings(mesh)`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        partial(_step_core, spec, cfg),
        in_shardings=(repl, data, data, data, data, data, data),
        out_shardings=(data, data),
    )


def serving_shardings(mesh):
    """(replicated params sharding, stream-axis sharding) for placing the
    sharded tick's inputs."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
