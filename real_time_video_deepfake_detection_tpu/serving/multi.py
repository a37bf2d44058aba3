"""Multi-stream serving frontend: dynamic batching onto one TPU step.

BASELINE config 4: N concurrent browser streams multiplexed through
/analyze. Each request carries a stream identity (form field `stream_id` or
`X-Stream-Id` header; absent -> the "default" stream, which preserves the
reference's single-stream semantics exactly). Requests park in a queue; a
batcher thread ticks when either `max_batch` frames are pending or
`batch_timeout_ms` elapses, runs ONE jitted device step for all of them
(serving/batcher.py), and completes the waiting requests.

Per-stream session state lives in the batched StreamStates pytree; /reset
with a stream id resets only that slot (without: resets everything, like the
reference). The global 100 ms rate limiter becomes per-stream.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import DetectorConfig, ServerConfig
from ..models import backbones
from ..pipeline.detector import preprocess_face_quality
from ..pipeline.faces import FaceDetector
from ..state.tracker import VERDICT_NAMES
from .batcher import (
    StreamStates, device_step, device_step_compact, init_stream_states,
    reset_streams,
)
from .wsgi import App, Request, Response, jsonify


def _jpeg_dims(data: bytes) -> Optional[tuple]:
    """(h, w) from the JPEG SOF marker — a pure header scan, no decode.

    Used on the device-detect JPEG fast path to learn the client frame's
    original size before the pooled native decode conforms it to
    detect_capture_hw, so face_bbox can be returned in the client's
    coordinate space (reference face_detection.py:84-88). None when the
    bytes are not parsable JPEG (the decode path 400s those anyway)."""
    n = len(data)
    if n < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    i = 2
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0xFF:
            # 0xFF fill bytes are legal padding before a marker (ITU T.81
            # B.1.1.2) — resync on the next byte instead of misreading a
            # fill byte as a marker with a bogus segment length (which
            # could land the scan on spurious in-payload "SOF" bytes and
            # return WRONG dims rather than None)
            i += 1
            continue
        if m == 0x00:    # FF 00 = stuffed literal data byte, not a marker
            i += 2
            continue
        if m == 0xDA:
            # SOS with no SOF seen: every valid JPEG places SOF before SOS
            # (ITU T.81 B.2.1) — scanning past SOS would walk entropy-coded
            # data where random bytes can masquerade as markers
            return None
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:   # standalone markers
            i += 2
            continue
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):   # SOFn
            h = (data[i + 5] << 8) | data[i + 6]
            w = (data[i + 7] << 8) | data[i + 8]
            return (h, w) if h and w else None
        seglen = (data[i + 2] << 8) | data[i + 3]
        if seglen < 2:
            return None
        i += 2 + seglen
    return None


@dataclass
class _Pending:
    stream_slot: int
    frame_256: Optional[np.ndarray] = None   # (256,256,3) u8 (host-prep mode)
    face_raw: Optional[np.ndarray] = None    # (160,160,3) f32/u8 or None
    face_hw: tuple = (0, 0)
    faces_detected: int = 0
    bbox: Optional[tuple] = None
    # device-detect mode: the capture-size frame; detection/align/crop all
    # happen inside the tick (serving/batcher.make_device_step_detect)
    frame_capture: Optional[np.ndarray] = None
    # device-detect JPEG fast path: raw bytes; the BATCHER decodes the whole
    # tick's worth in one pooled native call (tick-granular host prep)
    jpeg: Optional[bytes] = None
    # device-detect mode, off-size capture: the client frame's original
    # (h, w) so the tick's face_bbox can be returned in the client's
    # coordinate space (reference face_detection.py:84-88 scales boxes to
    # the input frame), not in detect_capture_hw space
    orig_hw: Optional[tuple] = None
    # owning stream id, checked against the live slot table at tick time:
    # a request parked in the queue while its stream is LRU-evicted must
    # NOT write into the slot's new owner's state
    stream_id: Optional[str] = None
    # JPEG path: the cheap SOF header scan failed, so the true client dims
    # must be recovered from the pooled tick decode (which reports source
    # dims for free) — never by an extra per-request host decode
    need_dims: bool = False
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    t_start: float = 0.0


class MultiStreamEngine:
    """Owns the stream table, the batched device state, and the batcher
    thread."""

    def __init__(self, cfg: DetectorConfig = DetectorConfig(),
                 server_cfg: ServerConfig = ServerConfig(),
                 params=None, spec=None,
                 aligner=None, face_detector: Optional[FaceDetector] = None,
                 clip_head_params=None, ssd_net=None):
        self.server_cfg = server_cfg
        self.spec = spec if spec is not None else backbones.make("b0")
        if cfg.clip_window > 0:
            # clip_feature_dim follows the backbone (config 5 swap): the
            # temporal head consumes whatever the backbone pools to.
            import dataclasses as _dc
            fdim = backbones.feature_dim(self.spec)
            if cfg.clip_feature_dim != fdim:
                cfg = _dc.replace(cfg, clip_feature_dim=fdim)
        if cfg.calibrator_knots is None:
            # same optional weights/calibrator.pkl the single-stream
            # detector applies — compiled into the tick so both serving
            # modes calibrate identically
            from ..train.calibration import load_default
            _cal = load_default()
            if _cal is not None and getattr(_cal, "x_", None) is not None:
                import dataclasses as _dc2
                cfg = _dc2.replace(cfg, calibrator_knots=(
                    tuple(float(v) for v in _cal.x_),
                    tuple(float(v) for v in _cal.y_)))
        self.cfg = cfg
        self.params = params if params is not None else backbones.init_params(
            jax.random.PRNGKey(0), self.spec)
        if cfg.clip_window > 0:
            # clip-attention verdict mode: the device step takes the
            # backbone + temporal head as one pytree (serving/batcher.py)
            if clip_head_params is None:
                from ..models import temporal_head as th
                from .batcher import clip_head_spec
                clip_head_params = th.init_params(
                    jax.random.PRNGKey(1), clip_head_spec(cfg))
            self.params = {"backbone": self.params,
                           "clip_head": clip_head_params}
        self.face_detector = face_detector or FaceDetector(
            confidence_threshold=cfg.ssd_confidence_threshold,
            min_face_px=cfg.min_face_px, backend=cfg.face_backend)
        if aligner is None:
            from ..pipeline.detector import _ResizeAligner
            aligner = _ResizeAligner()
        self.aligner = aligner
        # u8 face transfer is exact for the resize aligner (integer-valued
        # floats) and halves host->device face traffic; MTCNN crops are
        # fractional, so they keep f32.
        self._faces_dtype = (
            np.float32 if type(aligner).__name__ == "MTCNNAligner"
            else np.uint8)
        if (cfg.clahe_device and self._faces_dtype != np.uint8
                and not (server_cfg.device_detect and cfg.mtcnn_device)):
            # (mtcnn_device ticks CLAHE the crop on device BEFORE the in-tick
            # cascade, so the host aligner never sees CLAHE'd input there)
            raise ValueError("clahe_device requires the resize aligner "
                             "(u8 crops); MTCNN alignment needs the "
                             "CLAHE'd image on host")

        # Tick-schedule forensic variants (ServerConfig.forensic_tick_schedule):
        # index 0 = full tick, 1 = fast tick; one compiled program each.
        if server_cfg.forensic_tick_schedule:
            import dataclasses as _dc
            self._tick_cfgs = (
                _dc.replace(cfg, forensic_schedule="tick_full"),
                _dc.replace(cfg, forensic_schedule="tick_fast"))
        else:
            self._tick_cfgs = (cfg, cfg)
        self._tick_no = 0

        # Device-detect mode (ServerConfig.device_detect): SSD detection +
        # crop/align fused into the tick. Requires SSD weights and the
        # resize aligner (MTCNN re-detects on host and cannot be fused).
        self._detect_steps = None
        self._wire_steps = None
        if server_cfg.device_detect:
            mtcnn_params = None
            if cfg.mtcnn_device:
                mtcnn_params = getattr(self.aligner, "params", None)
                if (type(self.aligner).__name__ != "MTCNNAligner"
                        or mtcnn_params is None):
                    raise ValueError(
                        "mtcnn_device requires an MTCNNAligner (converted "
                        "facenet weights) on the engine")
            elif type(self.aligner).__name__ == "MTCNNAligner":
                raise ValueError("device_detect pairs with the resize "
                                 "aligner (or cfg.mtcnn_device to run the "
                                 "cascade in the tick); the plain MTCNN "
                                 "aligner is host-side")
            net = ssd_net
            if net is None:
                ssd = getattr(self.face_detector, "_ssd", None)
                net = ssd.net if ssd is not None else None
            if net is None:
                raise ValueError(
                    "device_detect requires SSD weights: pass ssd_net= or "
                    "construct the FaceDetector with a caffemodel")
            from .batcher import make_device_step_detect
            self._detect_steps = {
                c: make_device_step_detect(net, self.spec, c, mtcnn_params)
                for c in dict.fromkeys(self._tick_cfgs)}
            if server_cfg.ingest_plane != "bgr":
                if server_cfg.ingest_plane not in ("coef", "ycbcr420"):
                    raise ValueError(
                        f"unknown ingest_plane {server_cfg.ingest_plane!r} "
                        "(expected 'bgr', 'coef' or 'ycbcr420')")
                ch, cw = server_cfg.detect_capture_hw
                if ch % 16 or cw % 16:
                    raise ValueError(
                        "ingest_plane wire formats need detect_capture_hw "
                        f"divisible by 16 (got {server_cfg.detect_capture_hw})")
                from .batcher import make_device_step_detect_wire
                self._wire_steps = {
                    c: make_device_step_detect_wire(
                        net, self.spec, c, server_cfg.ingest_plane,
                        server_cfg.detect_capture_hw, mtcnn_params)
                    for c in dict.fromkeys(self._tick_cfgs)}
        if server_cfg.ingest_plane != "bgr" and not server_cfg.device_detect:
            raise ValueError("ingest_plane wire formats require "
                             "device_detect=True (the decode finishes "
                             "inside the device tick)")

        self.n_slots = server_cfg.max_streams
        # +1 dummy row: padded entries of compact (occupancy-bucketed)
        # ticks gather/scatter the dummy slot (serving/batcher.py
        # device_step_compact).
        self.states: StreamStates = init_stream_states(self.n_slots + 1, cfg)
        # Bucket sizes: smallest power-of-two >= occupancy, so a tick
        # transfers only ~the occupied slots instead of the full table.
        self.buckets = []
        b = 8
        while b < min(server_cfg.max_batch, self.n_slots):
            self.buckets.append(b)
            b *= 2
        self.buckets.append(min(server_cfg.max_batch, self.n_slots))
        self.slot_of: Dict[str, int] = {}
        self.last_request: Dict[int, float] = {}
        self.lock = threading.Lock()
        # Resets that arrive while a tick is dispatching outside the lock
        # accumulate here; _run_tick re-applies them to the tick's output
        # states so a /reset can never be overwritten by an in-flight tick.
        self._pending_reset: Optional[np.ndarray] = None
        self.queue: List[_Pending] = []
        self.queue_cv = threading.Condition(self.lock)
        # Observability (SURVEY.md §5: the reference only reports per-request
        # wall clock; here per-stage EWMAs + batch occupancy feed /metrics).
        self.metrics = {
            "ticks": 0, "frames_total": 0,
            "ewma_tick_latency_ms": 0.0, "ewma_host_prep_ms": 0.0,
            "ewma_batch_size": 0.0, "max_batch_seen": 0,
        }

        self._haar_probe: Optional[str] = None   # cached effective backend
        self._stop = False
        self._warmup()
        # Depth-limited in-flight tick queue: the batcher DISPATCHES device
        # steps without waiting for results (the per-stream state pytree
        # chains device-side between ticks); the drainer thread blocks on
        # readiness and completes the waiting requests. Host<->device sync
        # overlaps compute instead of serializing the tick loop (VERDICT #3:
        # the round-1 loop blocked on each tick's readback).
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=max(int(getattr(server_cfg, "pipeline_depth", 2)), 1))
        self._thread = threading.Thread(target=self._batcher_loop, daemon=True)
        self._thread.start()
        self._drainer = threading.Thread(target=self._drain_loop, daemon=True)
        self._drainer.start()

    def _ewma(self, key: str, value: float, alpha: float = 0.1):
        cur = self.metrics[key]
        self.metrics[key] = value if cur == 0.0 else (1 - alpha) * cur + alpha * value

    def _warmup(self):
        """Compile every bucket's device step before serving (first compile
        is tens of seconds; requests must never pay it)."""
        if self._detect_steps is not None:
            ch, cw = self.server_cfg.detect_capture_hw
            for step in dict.fromkeys(self._detect_steps.values()):
                for b in self.buckets:
                    out, _ = step(
                        self.params, jnp.zeros((b, ch, cw, 3), jnp.uint8),
                        jnp.zeros((b,), bool),
                        jnp.full((b,), self.n_slots, jnp.int32), self.states)
                    jax.block_until_ready(out["verdict"])
            if self._wire_steps is not None:
                plane = self.server_cfg.ingest_plane
                yb = (ch // 8) * (cw // 8)
                for step in dict.fromkeys(self._wire_steps.values()):
                    for b in self.buckets:
                        if plane == "coef":
                            wire = (jnp.zeros((b, yb, 64), jnp.int16),
                                    jnp.zeros((b, 2, yb // 4, 64), jnp.int16),
                                    jnp.zeros((b, 2, 64), jnp.uint16))
                        else:   # ycbcr420
                            wire = (jnp.zeros((b, ch, cw), jnp.uint8),
                                    jnp.zeros((b, 2, ch // 2, cw // 2),
                                              jnp.uint8))
                        out, _ = step(
                            self.params, *wire, jnp.zeros((b,), bool),
                            jnp.full((b,), self.n_slots, jnp.int32),
                            self.states)
                        jax.block_until_ready(out["verdict"])
            return
        h, w = self.cfg.forensic.analysis_size
        m = self.cfg.mtcnn_image_size
        for cfg in dict.fromkeys(self._tick_cfgs):   # unique variants
            for b in self.buckets:
                out, _ = device_step_compact(
                    self.spec, cfg, self.params,
                    jnp.zeros((b, h, w, 3), jnp.uint8),
                    jnp.zeros((b, m, m, 3), jnp.dtype(self._faces_dtype)),
                    jnp.zeros((b,), bool), jnp.zeros((b, 2), jnp.int32),
                    jnp.zeros((b,), bool),
                    jnp.full((b,), self.n_slots, jnp.int32), self.states)
                jax.block_until_ready(out["verdict"])

    # ------------------------------------------------------------- streams

    def _reset_mask_locked(self, mask: np.ndarray) -> None:
        """Apply a per-slot reset. Caller holds self.lock. Also records the
        mask so a device tick currently dispatching outside the lock re-zeros
        these slots in its output states (_run_tick)."""
        self.states = reset_streams(self.states, jnp.asarray(mask))
        if self._pending_reset is None:
            self._pending_reset = mask.copy()
        else:
            self._pending_reset |= mask

    def slot_for(self, stream_id: str) -> int:
        with self.lock:
            return self._slot_for_locked(stream_id)

    def _slot_for_locked(self, stream_id: str) -> int:
        if stream_id in self.slot_of:
            return self.slot_of[stream_id]
        if len(self.slot_of) >= self.n_slots:
            # evict least-recently-used stream
            lru = min(self.slot_of.items(),
                      key=lambda kv: self.last_request.get(kv[1], 0.0))
            slot = lru[1]
            del self.slot_of[lru[0]]
            # the new stream must not inherit the evicted stream's
            # rate-limit timestamp (its first request would be falsely
            # 429'd at full load)
            self.last_request.pop(slot, None)
            mask = np.zeros(self.n_slots + 1, bool)
            mask[slot] = True
            self._reset_mask_locked(mask)
        else:
            slot = len(self.slot_of)
        self.slot_of[stream_id] = slot
        return slot

    def rate_limited(self, slot: int) -> Optional[int]:
        now = time.time()
        with self.lock:
            last = self.last_request.get(slot, 0.0)
            if now - last < self.server_cfg.min_request_interval:
                return int((self.server_cfg.min_request_interval
                            - (now - last)) * 1000)
            self.last_request[slot] = now
        return None

    def admit(self, stream_id: str) -> Tuple[int, Optional[int]]:
        """Resolve/create the stream's slot AND check+stamp its rate window
        under ONE lock acquisition. Returns (slot, retry_after_ms); the
        request is admitted (window stamped) iff retry_after_ms is None.

        This closes the /analyze TOCTOU: reading slot_of and then calling
        rate_limited() in a second acquisition let two concurrent first
        requests from one stream both pass the limiter, and let an LRU
        eviction land between the read and the stamp so the stamp hit
        another stream's slot. An existing stream is never evicted here, so
        a 429 still cannot zero anyone's temporal state; a brand-new stream
        is always admitted (its slot's timestamp was cleared on eviction).
        Mirrors reference backend_server.py:195-204 (0.5 s min interval)."""
        now = time.time()
        with self.lock:
            existing = stream_id in self.slot_of
            slot = self._slot_for_locked(stream_id)
            last = self.last_request.get(slot, 0.0)
            if existing and now - last < self.server_cfg.min_request_interval:
                return slot, int((self.server_cfg.min_request_interval
                                  - (now - last)) * 1000)
            self.last_request[slot] = now
            return slot, None

    def reset(self, stream_id: Optional[str] = None) -> None:
        with self.lock:
            mask = np.zeros(self.n_slots + 1, bool)
            if stream_id is None:
                mask[:] = True
                self.last_request.clear()
            elif stream_id in self.slot_of:
                mask[self.slot_of[stream_id]] = True
                self.last_request.pop(self.slot_of[stream_id], None)
            self._reset_mask_locked(mask)
        # /reset is the session boundary (extension/content.js:156-167) —
        # re-probe detector availability so artifacts installed after boot
        # (cascade XML, native toolchain) take effect without a restart, and
        # the native-prep eligibility cache follows the refreshed ladder.
        self._haar_probe = None
        fd = self.face_detector
        if isinstance(fd, FaceDetector):
            fd._probed.clear()

    def frame_count(self, stream_id: str = "default") -> int:
        with self.lock:
            slot = self.slot_of.get(stream_id)
        if slot is None:
            return 0
        return int(np.asarray(self.states.frame_count)[slot])

    def stream_stats(self, slot: int) -> dict:
        """/stats scalars for one slot as ONE jitted dispatch + ONE bulk
        device->host fetch. Chaining the un-jitted tracker reducers here
        would pay ~10 per-op round trips per monitoring poll on remote
        (tunneled) runtimes."""
        if getattr(self, "_stats_jit", None) is None:
            from ..state.tracker import (
                tracker_stability, tracker_temporal_average, tracker_verdict,
                tracker_voting_stats,
            )

            def _f(tracker, frame_count, slot):
                t = jax.tree.map(lambda x: x[slot], tracker)
                fake, real, total = tracker_voting_stats(t)
                return (frame_count[slot], tracker_temporal_average(t),
                        tracker_stability(t), tracker_verdict(t),
                        t.n_scores, fake, real, total)

            self._stats_jit = jax.jit(_f)
        with self.lock:
            states = self.states
        vals = jax.device_get(self._stats_jit(
            states.tracker, states.frame_count, jnp.asarray(slot)))
        fc, t_avg, stab, verdict, n_scores, fake, real, total = vals
        return {
            "frame_count": int(fc),
            "temporal_average": float(t_avg),
            "stability_score": float(stab),
            "confidence_level": VERDICT_NAMES[int(verdict)],
            "history_length": int(n_scores),
            "voting": {"fake_count": int(fake), "real_count": int(real),
                       "total_frames": int(total)},
        }

    # --------------------------------------------------------------- intake

    def _native_prep_eligible(self) -> bool:
        """The one-call native prep (utils/native_ingest.prep_frame)
        reproduces exactly: heuristic detection + resize aligner + CLAHE.
        It is used only when the ladder's EFFECTIVE backend is the heuristic
        (no SSD weights, no cv2 haar, no cascade XML — or the config pinned
        face_backend="heuristic"); otherwise the Python path runs the real
        detector so /analyze behavior always matches engine.analyze."""
        if self._detect_steps is not None:   # detection runs in the tick
            return False
        if type(self.aligner).__name__ != "_ResizeAligner":
            return False
        if self.cfg.clahe_device:   # native prep applies host CLAHE
            return False
        fd = self.face_detector
        if not isinstance(fd, FaceDetector):
            return False
        if self._haar_probe is None:
            self._haar_probe = fd.backend
        return self._haar_probe == "heuristic"

    def analyze_jpeg(self, data: bytes, stream_id: str = "default",
                     timeout: float = 60.0) -> Optional[dict]:
        """JPEG fast path. Two variants:

        device-detect mode: enqueue the RAW bytes; the batcher drains the
        whole tick through ONE pooled native decode+resize call
        (tick-granular host prep — request threads do zero image work). A
        failed decode returns {"error": "Invalid image format",
        "status": 400}.

        host-prep mode: decode -> resize -> detect -> CLAHE -> align in one
        GIL-free native call (ingest_prep_frame) per request. Returns None
        when that path is unavailable (caller decodes and uses analyze())."""
        if self._detect_steps is not None:
            t0 = time.time()
            slot = self.slot_for(stream_id)
            dims = _jpeg_dims(data)
            ch, cw = self.server_cfg.detect_capture_hw
            # If the SOF scan fails (unusual marker layout, e.g. a
            # zero-height SOF with a DNL marker) the true client dims are
            # recovered from the pooled tick decode itself — the native
            # batch API reports pre-scaling source dims for free (round-3
            # advisor item; request threads never decode image data).
            p = _Pending(stream_slot=slot, stream_id=stream_id, jpeg=data,
                         t_start=t0,
                         orig_hw=dims if dims and dims != (ch, cw) else None,
                         need_dims=dims is None)
            with self.queue_cv:
                self.queue.append(p)
                self.queue_cv.notify()
            if not p.event.wait(timeout):
                raise TimeoutError("device tick timed out")
            return p.result
        if not self._native_prep_eligible():
            return None
        from ..utils.native_ingest import prep_frame
        t0 = time.time()
        r = prep_frame(data, self.cfg.forensic.analysis_size,
                       self.cfg.mtcnn_image_size)
        if r is None:
            return None
        frame256, aligned, box = r
        slot = self.slot_for(stream_id)
        if aligned is not None and self._faces_dtype == np.float32:
            aligned = aligned.astype(np.float32)
        p = _Pending(
            stream_slot=slot, stream_id=stream_id,
            frame_256=frame256, face_raw=aligned,
            face_hw=(box[3], box[2]) if box else (0, 0),
            faces_detected=1 if box else 0,
            bbox=box, t_start=t0)
        with self.queue_cv:
            self.queue.append(p)
            self.queue_cv.notify()
        if not p.event.wait(timeout):
            raise TimeoutError("device tick timed out")
        return p.result

    def analyze(self, frame_bgr: np.ndarray, stream_id: str = "default",
                timeout: float = 60.0) -> dict:
        """Host-side prep (resize, face detect, align) then enqueue for the
        next device tick. Blocks until the tick completes.

        In device-detect mode the ONLY host prep is conforming the frame to
        the fixed capture shape; detection, resizes, crop/align, CLAHE,
        classification and the tracker all run inside the tick."""
        t0 = time.time()
        slot = self.slot_for(stream_id)

        if self._detect_steps is not None:
            ch, cw = self.server_cfg.detect_capture_hw
            orig_hw = None
            if frame_bgr.shape[:2] != (ch, cw):
                # off-size capture: conform on host (bit-exact cv2 resize);
                # the tick's bbox is scaled back to the client frame at
                # response assembly (orig_hw)
                orig_hw = frame_bgr.shape[:2]
                from ..utils.host_resize import resize_analysis
                frame_bgr = resize_analysis(frame_bgr, ch, cw)
            p = _Pending(stream_slot=slot, stream_id=stream_id,
                         frame_capture=frame_bgr,
                         orig_hw=orig_hw, t_start=t0)
            with self.queue_cv:
                self.queue.append(p)
                self.queue_cv.notify()
            if not p.event.wait(timeout):
                raise TimeoutError("device tick timed out")
            return p.result

        h, w = self.cfg.forensic.analysis_size
        from ..utils.host_resize import resize_analysis
        frame256 = resize_analysis(frame_bgr, h, w)

        faces = self.face_detector(frame_bgr)
        face_raw = None
        face_hw = (0, 0)
        bbox = None
        if faces:
            x, y, fw, fh = faces[0]
            m = self.server_cfg.align_box_multiple
            if m > 0 and type(self.aligner).__name__ == "MTCNNAligner":
                # quantize crop size to bound MTCNN's compiled-size set
                H, W = frame_bgr.shape[:2]
                fw = min(-(-fw // m) * m, W - x)
                fh = min(-(-fh // m) * m, H - y)
            region = frame_bgr[y:y + fh, x:x + fw]
            try:
                # clahe_device: ship the raw aligned crop; the device step
                # applies CLAHE (serving/batcher.py _step_core)
                pre = (region if self.cfg.clahe_device
                       else preprocess_face_quality(region))
                face_raw = self.aligner(pre)
            except Exception:
                face_raw = None
            if face_raw is not None:
                face_hw = (fh, fw)
                bbox = (x, y, fw, fh)

        p = _Pending(stream_slot=slot, stream_id=stream_id,
                     frame_256=frame256, face_raw=face_raw,
                     face_hw=face_hw, faces_detected=len(faces), bbox=bbox,
                     t_start=t0)
        with self.queue_cv:
            self.queue.append(p)
            self.queue_cv.notify()
        if not p.event.wait(timeout):
            raise TimeoutError("device tick timed out")
        return p.result

    # -------------------------------------------------------------- batcher

    def _batcher_loop(self):
        timeout_s = self.server_cfg.batch_timeout_ms / 1000.0
        while not self._stop:
            with self.queue_cv:
                if not self.queue:
                    self.queue_cv.wait(timeout=0.1)
                    continue
                deadline = time.time() + timeout_s
                while (len(self.queue) < self.server_cfg.max_batch
                       and time.time() < deadline):
                    self.queue_cv.wait(timeout=max(deadline - time.time(), 0.001))
                # at most one request per stream slot per tick (a second
                # frame from the same stream waits for the next tick, so
                # per-stream state updates stay ordered)
                batch, taken = [], set()
                rest = []
                for p in self.queue:
                    if (len(batch) < self.server_cfg.max_batch
                            and p.stream_slot not in taken):
                        batch.append(p)
                        taken.add(p.stream_slot)
                    else:
                        rest.append(p)
                self.queue = rest
            try:
                self._run_tick(batch)
            except Exception as e:
                for p in batch:
                    p.result = {"error": str(e)}
                    p.event.set()

    def _bucket_for(self, n_req: int) -> int:
        for b in self.buckets:
            if b >= n_req:
                return b
        return self.buckets[-1]

    def _drop_stale(self, batch: List[_Pending]) -> List[_Pending]:
        """Fail requests whose stream was LRU-evicted while parked in the
        queue: their slot now belongs to a different (freshly-reset) stream,
        so running them would pollute the new stream's temporal state and
        return the new stream's counters to the old client."""
        kept: List[_Pending] = []
        with self.lock:
            stale = [p for p in batch
                     if p.stream_id is not None
                     and self.slot_of.get(p.stream_id) != p.stream_slot]
        stale_set = set(map(id, stale))
        for p in batch:
            if id(p) in stale_set:
                p.result = {"error": "stream evicted while request queued "
                                     "(max_streams exceeded)", "status": 409}
                p.event.set()
            else:
                kept.append(p)
        return kept

    def _run_tick(self, batch: List[_Pending]):
        """Assemble the compact bucketed batch and DISPATCH one device step;
        results are completed asynchronously by _drain_loop."""
        batch = self._drop_stale(batch)
        if not batch:
            return
        if self._detect_steps is not None:
            return self._run_tick_detect(batch)
        b = self._bucket_for(len(batch))
        h, w = self.cfg.forensic.analysis_size
        frames = np.zeros((b, h, w, 3), np.uint8)
        faces = np.zeros((b, self.cfg.mtcnn_image_size,
                          self.cfg.mtcnn_image_size, 3), self._faces_dtype)
        has_face = np.zeros(b, bool)
        face_hw = np.zeros((b, 2), np.int32)
        active = np.zeros(b, bool)
        slot_idx = np.full(b, self.n_slots, np.int32)   # dummy slot
        entries: List[_Pending] = []
        for i, p in enumerate(batch):
            entries.append(p)
            slot_idx[i] = p.stream_slot
            frames[i] = p.frame_256
            active[i] = True
            if p.face_raw is not None:
                faces[i] = p.face_raw
                has_face[i] = True
                face_hw[i] = p.face_hw

        t_dev = time.time()
        # Snapshot the state handle under the lock, DISPATCH outside it:
        # on remote runtimes dispatch takes milliseconds and must not
        # serialize against /stats, slot_for, and rate-limit checks
        # (round-2 verdict "engine lock held across device dispatch").
        # Only this batcher thread dispatches, so states cannot be
        # concurrently replaced by another tick; resets that land during
        # dispatch are re-applied to new_states below via _pending_reset.
        with self.lock:
            interval = self.cfg.full_forensic_interval
            tick_cfg = self._tick_cfgs[0 if self._tick_no % interval == 0 else 1]
            self._tick_no += 1
            states = self.states
            self._pending_reset = None
        out, new_states = device_step_compact(
            self.spec, tick_cfg, self.params,
            jnp.asarray(frames), jnp.asarray(faces), jnp.asarray(has_face),
            jnp.asarray(face_hw), jnp.asarray(active),
            jnp.asarray(slot_idx), states)
        with self.lock:
            if self._pending_reset is not None:
                new_states = reset_streams(
                    new_states, jnp.asarray(self._pending_reset))
                self._pending_reset = None
            self.states = new_states
        # blocks only when `pipeline_depth` ticks are already in flight
        self._inflight.put((out, entries, has_face, t_dev, None))

    def _run_tick_wire(self, jpeg_entries: List[_Pending]) -> Optional[set]:
        """Wire-format ingest dispatch (ServerConfig.ingest_plane "coef" /
        "ycbcr420"): ONE pooled native call splits the JPEG codec at the
        entropy (or raw-plane) boundary, decoding straight into the padded
        bucket batch; the device tick finishes the decode bit-exactly
        (ops/jpeg_decode.py) before detection. Ineligible entries (not
        YCbCr 4:2:0 at the capture size) stay flagged inactive here and are
        returned to the caller's full-decode fallback path.

        Returns the set of id()s of entries this dispatch handled, or None
        when the native wire decode is unavailable (caller does everything
        the legacy way)."""
        from ..utils import native_ingest as NI
        ch, cw = self.server_cfg.detect_capture_hw
        plane = self.server_cfg.ingest_plane
        t_prep = time.time()
        n = len(jpeg_entries)
        b = self._bucket_for(n)
        datas = [p.jpeg for p in jpeg_entries]
        if plane == "coef":
            res = NI.decode_coefs_batch(datas, ch, cw,
                                        self.server_cfg.prep_threads,
                                        pad_to=b)
            if res is None:
                return None
            coef_y, coef_c, qtab, ok = res
            wire = (jnp.asarray(coef_y), jnp.asarray(coef_c),
                    jnp.asarray(qtab))
        else:   # ycbcr420
            res = NI.decode_raw420_batch(datas, ch, cw,
                                         self.server_cfg.prep_threads,
                                         pad_to=b)
            if res is None:
                return None
            y, c, ok = res
            wire = (jnp.asarray(y), jnp.asarray(c))
        if not ok.any():
            return set()    # nothing eligible; no dispatch needed
        self._ewma("ewma_host_prep_ms", (time.time() - t_prep) * 1000)

        active = np.zeros(b, bool)
        slot_idx = np.full(b, self.n_slots, np.int32)
        entries: List[_Pending] = []
        rows: List[int] = []
        handled = set()
        for i, p in enumerate(jpeg_entries):
            if not ok[i]:
                continue
            active[i] = True
            slot_idx[i] = p.stream_slot
            entries.append(p)
            rows.append(i)
            handled.add(id(p))
            if p.need_dims:
                # eligibility proved dims == detect_capture_hw exactly
                p.orig_hw = None

        t_dev = time.time()
        with self.lock:
            interval = self.cfg.full_forensic_interval
            step = self._wire_steps[
                self._tick_cfgs[0 if self._tick_no % interval == 0 else 1]]
            self._tick_no += 1
            states = self.states
            self._pending_reset = None
        out, new_states = step(self.params, *wire, jnp.asarray(active),
                               jnp.asarray(slot_idx), states)
        with self.lock:
            if self._pending_reset is not None:
                new_states = reset_streams(
                    new_states, jnp.asarray(self._pending_reset))
                self._pending_reset = None
            self.states = new_states
        self._inflight.put((out, entries, None, t_dev, np.asarray(rows)))
        return handled

    def _run_tick_detect(self, batch: List[_Pending]):
        """Device-detect tick. Host work: ONE pooled native decode+resize
        call for every JPEG request in the tick (ingest_decode_resize_batch,
        ServerConfig.prep_threads workers, GIL released) + stacking; SSD
        detection, resizes, crop/align and classification run in ONE
        dispatched program (batcher.make_device_step_detect).

        With a wire-format ingest_plane, JPEG entries route through
        _run_tick_wire first; only ineligible ones (plus raw-frame
        requests) fall through to this full-decode path as a second
        dispatch — per-slot ordering holds because a slot appears at most
        once per tick."""
        ch, cw = self.server_cfg.detect_capture_hw
        t_prep = time.time()
        jpeg_entries = [p for p in batch if p.jpeg is not None]
        if jpeg_entries and self._wire_steps is not None:
            handled = self._run_tick_wire(jpeg_entries)
            if handled is not None:
                batch = [p for p in batch if id(p) not in handled]
                if not batch:
                    return
                jpeg_entries = [p for p in batch if p.jpeg is not None]
        if jpeg_entries:
            from ..utils.native_ingest import decode_resize_batch
            decoded, ok, src_dims = decode_resize_batch(
                [p.jpeg for p in jpeg_entries], ch, cw,
                self.server_cfg.prep_threads,
                fast=self.server_cfg.ingest_scaled_decode, with_dims=True)
            for j, p in enumerate(jpeg_entries):
                if decoded is not None and ok[j]:
                    p.frame_capture = decoded[j]
                    if p.need_dims:
                        # SOF scan failed on the request thread: the pooled
                        # decode's true source dims keep the client-space
                        # bbox guarantee with zero extra decodes
                        shw = (int(src_dims[j, 0]), int(src_dims[j, 1]))
                        p.orig_hw = shw if shw != (ch, cw) else None
                    continue
                # native unavailable or this JPEG corrupt: cv2 fallback
                import cv2
                arr = np.frombuffer(p.jpeg, np.uint8)
                f = cv2.imdecode(arr, cv2.IMREAD_COLOR) if arr.size else None
                if f is None:
                    p.result = {"error": "Invalid image format",
                                "status": 400}
                    p.event.set()
                    continue
                if p.need_dims:
                    shw = f.shape[:2]
                    p.orig_hw = shw if shw != (ch, cw) else None
                if f.shape[:2] != (ch, cw):
                    from ..utils.host_resize import resize_analysis
                    f = resize_analysis(f, ch, cw)
                p.frame_capture = f
            batch = [p for p in batch if p.frame_capture is not None]
            if not batch:
                return
            # only ticks that actually decoded JPEGs contribute — frame
            # requests prep in their own threads and would drag the EWMA
            # to zero
            self._ewma("ewma_host_prep_ms", (time.time() - t_prep) * 1000)

        b = self._bucket_for(len(batch))
        frames = np.zeros((b, ch, cw, 3), np.uint8)
        active = np.zeros(b, bool)
        slot_idx = np.full(b, self.n_slots, np.int32)   # dummy slot
        entries: List[_Pending] = []
        for i, p in enumerate(batch):
            entries.append(p)
            slot_idx[i] = p.stream_slot
            frames[i] = p.frame_capture
            active[i] = True

        t_dev = time.time()
        with self.lock:
            interval = self.cfg.full_forensic_interval
            step = self._detect_steps[
                self._tick_cfgs[0 if self._tick_no % interval == 0 else 1]]
            self._tick_no += 1
            states = self.states
            self._pending_reset = None
        out, new_states = step(self.params, jnp.asarray(frames),
                               jnp.asarray(active), jnp.asarray(slot_idx),
                               states)
        with self.lock:
            if self._pending_reset is not None:
                new_states = reset_streams(
                    new_states, jnp.asarray(self._pending_reset))
                self._pending_reset = None
            self.states = new_states
        # has_face=None: the drainer reads it from the device output
        self._inflight.put((out, entries, None, t_dev, None))

    def _drain_loop(self):
        while not self._stop:
            try:
                item = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            out_dev, entries, has_face, t_dev, rows = item
            try:
                # one bulk device->host fetch (per-array fetches each pay a
                # round trip on remote runtimes)
                out = jax.device_get(out_dev)
            except Exception as e:
                for p in entries:
                    p.result = {"error": str(e)}
                    p.event.set()
                continue
            try:
                self._complete(out, entries, has_face, t_dev, rows)
            except Exception as e:
                # The drainer must survive ANY completion error: if this
                # thread dies, the batcher fills the bounded _inflight queue
                # and then blocks forever — every request times out with no
                # log. Fail the affected entries loudly instead.
                import logging
                logging.getLogger(__name__).exception(
                    "tick completion failed: %s", e)
                for p in entries:
                    if not p.event.is_set():
                        p.result = {"error": str(e)}
                        p.event.set()

    def _complete(self, out: Dict[str, np.ndarray],
                  entries: List[_Pending], has_face, t_dev: float,
                  rows=None):
        if rows is not None:
            # wire-ingest ticks leave ineligible entries in place as
            # inactive rows instead of compacting the batch (zero-copy
            # pooled decode); map entry k to its device row rows[k]
            out = {k: v[rows] for k, v in out.items()}
        if has_face is None:   # device-detect mode: detection ran on device
            has_face = out["has_face"]
        m = self.metrics
        n_req = len(entries)
        m["ticks"] += 1
        m["frames_total"] += n_req
        m["max_batch_seen"] = max(m["max_batch_seen"], n_req)
        # dispatch->completed latency: includes up to pipeline_depth
        # ticks of in-flight queue wait, NOT pure device time
        self._ewma("ewma_tick_latency_ms", (time.time() - t_dev) * 1000)
        self._ewma("ewma_batch_size", float(n_req))
        if self._detect_steps is None:
            # host-prep mode: prep happens in request threads before enqueue
            # (in detect mode _run_tick_detect measures the pooled decode)
            host_ms = [(t_dev - p.t_start) * 1000 for p in entries]
            self._ewma("ewma_host_prep_ms", float(np.mean(host_ms)))

        for i, p in enumerate(entries):
            fake_prob = float(out["fake_probability"][i])
            face_prob = float(out["face_probability"][i])
            forensic_prob = float(out["frame_forensic_probability"][i])
            verdict = VERDICT_NAMES[int(out["verdict"][i])]
            ms = round((time.time() - p.t_start) * 1000, 1)
            faces_detected = (int(out["faces_detected"][i])
                              if "faces_detected" in out else p.faces_detected)
            resp = {
                "success": True,
                "analysis_mode": "face+frame" if has_face[i] else "frame_only",
                "faces_detected": faces_detected,
                "fake_probability": fake_prob,
                "frame_forensic_probability": forensic_prob,
                "real_probability": 1.0 - fake_prob,
                "confidence_level": verdict,
                "temporal_average": float(out["temporal_average"][i]),
                "stability_score": float(out["stability_score"][i]),
                "frame_count": int(out["frame_count"][i]),
                "processing_time_ms": ms,
            }
            if has_face[i]:
                resp["face_probability"] = face_prob
                bbox = (p.bbox if p.bbox is not None
                        else tuple(int(v) for v in out["face_bbox"][i]))
                x, y, fw, fh = bbox
                if p.bbox is None and p.orig_hw is not None:
                    # device-detect tick box is in detect_capture_hw space;
                    # scale back to the client's frame so overlays land
                    # where the reference would put them
                    oh, ow = p.orig_hw
                    ch, cw = self.server_cfg.detect_capture_hw
                    x = max(0, min(int(round(x * ow / cw)), ow - 1))
                    y = max(0, min(int(round(y * oh / ch)), oh - 1))
                    fw = max(1, min(int(round(fw * ow / cw)), ow - x))
                    fh = max(1, min(int(round(fh * oh / ch)), oh - y))
                resp["face_bbox"] = {"x": int(x), "y": int(y),
                                     "width": int(fw), "height": int(fh)}
            if "clip_probability" in out:   # clip-attention mode (config 5)
                resp["clip_probability"] = float(out["clip_probability"][i])
                resp["clip_frames"] = int(out["clip_frames"][i])
            p.result = resp
            p.event.set()

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=2.0)
        self._drainer.join(timeout=2.0)


def create_batched_app(engine: Optional[MultiStreamEngine] = None,
                       server_cfg: ServerConfig = ServerConfig()) -> App:
    """WSGI app with the reference surface, backed by the batching engine.
    Without a stream id the behavior is the reference's single global
    stream."""
    app = App()
    if engine is None:
        engine = MultiStreamEngine(
            DetectorConfig().with_threshold(server_cfg.detection_threshold),
            server_cfg)
    app.engine = engine

    from .server import _device_strings
    _device, _accel_name = _device_strings()

    def _stream_id(req: Request) -> str:
        return (req.form.get("stream_id")
                or req.environ.get("HTTP_X_STREAM_ID")
                or "default")

    @app.route("/health", methods=["GET"])
    def health(_req):
        return jsonify({
            "status": "healthy",
            "model_loaded": True,
            "device": _device,
            "gpu_name": _accel_name,
            "frame_count": engine.frame_count(),
            "capabilities": {"face_detection": True, "frame_forensics": True,
                             "temporal_tracking": True},
        })

    @app.route("/reset", methods=["POST"])
    def reset(req):
        sid = req.form.get("stream_id") or req.environ.get("HTTP_X_STREAM_ID")
        engine.reset(sid)
        return jsonify({"success": True, "message": "Detector reset successfully"})

    @app.route("/analyze", methods=["POST"])
    def analyze(req):
        # Validate BEFORE allocating a stream slot: slot_for can LRU-evict
        # (and zero the temporal state of) a live stream, so an invalid
        # request — no frame field, or a 429 for an existing stream — must
        # never trigger an eviction.
        if "frame" not in req.files:
            return jsonify({"error": "No frame provided"}, 400)
        data = req.files["frame"]
        sid = _stream_id(req)
        # single-acquisition admit: slot resolution + rate check + stamp
        # are atomic (see MultiStreamEngine.admit for the TOCTOU this closes)
        _slot, retry = engine.admit(sid)
        if retry is not None:
            return jsonify({"error": "Rate limited",
                            "retry_after_ms": retry}, 429)
        try:
            # JPEG fast path: zero image work in this request thread —
            # either the per-request native prep call (host-prep mode) or
            # deferred bytes decoded by the batcher's pooled call per tick
            # (device-detect mode)
            if data[:2] == b"\xff\xd8":
                result = engine.analyze_jpeg(data, sid)
                if result is not None:
                    if "error" in result:
                        return jsonify({"error": result["error"]},
                                       result.get("status", 500))
                    return jsonify(result)
            # Python path: the shared decode ladder (native JPEG -> cv2)
            from .server import _decode_frame
            frame = _decode_frame(data)
            if frame is None:
                return jsonify({"error": "Invalid image format"}, 400)
            result = engine.analyze(frame, sid)
            if "error" in result:
                # tick/drain failures surface as error dicts; the reference
                # returns 500 for analyze exceptions (backend_server.py:235)
                return jsonify({"error": result["error"]},
                               result.get("status", 500))
            return jsonify(result)
        except Exception as e:
            return jsonify({"error": str(e)}, 500)

    @app.route("/metrics", methods=["GET"])
    def metrics(_req):
        """Additive observability endpoint (not part of the preserved
        reference surface): batching + device telemetry."""
        with engine.lock:
            active_streams = len(engine.slot_of)
        return jsonify({**{k: (round(v, 3) if isinstance(v, float) else v)
                           for k, v in engine.metrics.items()},
                        "active_streams": active_streams,
                        "max_streams": engine.n_slots})

    @app.route("/profile", methods=["POST"])
    def profile(req):
        """Capture a jax.profiler device trace for `seconds` (form field,
        default 2) into /tmp/tpu_profile — the SURVEY §5 tracing subsystem.
        Additive endpoint; may be unavailable on proxied runtimes."""
        import threading as _t
        secs = float(req.form.get("seconds", "2"))
        outdir = req.form.get("dir", "/tmp/tpu_profile")
        try:
            jax.profiler.start_trace(outdir)
        except Exception as e:
            return jsonify({"success": False, "error": str(e)}, 500)

        def _stop():
            time.sleep(min(secs, 30.0))
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

        _t.Thread(target=_stop, daemon=True).start()
        return jsonify({"success": True, "dir": outdir,
                        "seconds": min(secs, 30.0)})

    @app.route("/stats", methods=["GET"])
    def stats(req):
        sid = _stream_id(req)
        with engine.lock:
            slot = engine.slot_of.get(sid)
        if slot is None:
            return jsonify({"frame_count": 0, "temporal_average": 0.0,
                            "stability_score": 0.0,
                            "confidence_level": "UNCERTAIN",
                            "history_length": 0,
                            "voting": {"fake_count": 0, "real_count": 0,
                                       "total_frames": 0},
                            "device": _device})
        return jsonify({**engine.stream_stats(slot), "device": _device})

    return app
