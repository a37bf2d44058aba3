"""DeepfakeDetector — the per-frame orchestrator (TPU-native rebuild of
reference deepfake_detection.py:292-736).

Per-frame graph (server semantics, backend_server.py:117-238):
  frame (BGR u8) -> [device] resize 256 + forensic signals (full every 3rd
  frame) -> [host] face detect (SSD on device / Haar fallback) -> [device]
  CLAHE-preprocessed face -> align -> classify (EfficientNet) -> sigmoid ->
  [host] small-face heuristic -> tracker update -> verdict.

Device work is three jitted calls (forensic step, face classify); host work
is JPEG decode, face boxes, and scalar bookkeeping. The batched multi-stream
variant lives in serving/batcher.py.

Key behavioral contracts preserved:
  - full forensics iff frame_count % 3 == 0, with the SERVER's off-by-one
    (forensics run BEFORE frame_count increments — backend_server.py:148-156;
    the library predict() increments first — deepfake_detection.py:597-600;
    both entry points reproduce their own reference semantics)
  - tracker updated with the FACE probability when a face is analyzed, not a
    70/30 blend (deepfake_detection.py:620-623); fusion weights exist but
    default off (cfg.fuse_forensics) for verdict parity
  - analyze_face returns None on failure -> graceful downgrade to
    forensic-only (deepfake_detection.py:548-550)
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import DetectorConfig
from ..models import backbones
from ..ops import forensics
from ..ops.clahe import clahe_u8_numpy
from ..state.forensic_state import ForensicState, forensic_state_init, forensic_state_reset
from ..state.tracker import TemporalTracker
from .classify import classify_batch, apply_small_face_heuristic
from .faces import FaceDetector, Box


_LAB_BACKEND: Optional[str] = None   # resolved once: "cv2" | "native" | "jnp"


def _resolve_lab_backend() -> str:
    """Lab round-trip ladder: cv2 -> native C -> jnp — same treatment the
    resize/decode paths got. The non-cv2 rungs are parity-tested against
    cv2's float Lab math (tests/test_pallas_kernels.py, <=1 u8 step; see
    docs/DESIGN.md "Known numeric deviations"), and a downgrade warns ONCE
    instead of letting analyze_face's blanket except silently drop every
    face to forensic-only on a cv2-less install."""
    global _LAB_BACKEND
    if _LAB_BACKEND is None:
        try:
            import cv2  # noqa: F401
            _LAB_BACKEND = "cv2"
        except Exception:
            from ..utils.native_ingest import get_lib
            _LAB_BACKEND = "native" if get_lib() is not None else "jnp"
            import warnings
            warnings.warn(
                "cv2 unavailable: face-quality CLAHE falls back to the "
                f"parity-tested '{_LAB_BACKEND}' Lab backend "
                "(<=1 u8 step vs cv2)", RuntimeWarning, stacklevel=3)
    return _LAB_BACKEND


def preprocess_face_quality(face_bgr: np.ndarray,
                            lab_backend: Optional[str] = None) -> np.ndarray:
    """CLAHE contrast enhancement on the LAB L channel
    (deepfake_detection.py:357-370). Lab conversion goes through the
    cv2 -> native C (ingest.cpp bgr_to_lab_u8) -> jnp (ops/color) ladder;
    CLAHE itself is our implementation (ops/clahe.py). `lab_backend` pins
    a rung for tests."""
    backend = lab_backend or _resolve_lab_backend()
    if backend == "native":
        from ..utils.native_ingest import bgr2lab_native
        lab = bgr2lab_native(face_bgr)
        if lab is None:   # library vanished after resolve; drop a rung
            backend = "jnp"
    if backend == "cv2":
        import cv2
        lab = cv2.cvtColor(face_bgr, cv2.COLOR_BGR2LAB)
    elif backend == "jnp":
        from ..ops.color import rgb_to_lab_u8
        lab = np.asarray(rgb_to_lab_u8(
            jnp.asarray(np.ascontiguousarray(face_bgr[..., ::-1]))))
    l, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    l = clahe_u8_numpy(l, clip_limit=2.0, tiles=8)
    merged = np.stack([l, a, b], axis=-1)
    if backend == "cv2":
        import cv2
        return cv2.cvtColor(merged, cv2.COLOR_LAB2BGR)
    if backend == "native":
        from ..utils.native_ingest import lab2bgr_native
        out = lab2bgr_native(merged)
        if out is not None:
            return out
    from ..ops.color import lab_to_rgb_u8
    return np.asarray(lab_to_rgb_u8(jnp.asarray(merged)))[..., ::-1].copy()


class _ResizeAligner:
    """Fallback aligner: whole CLAHE'd crop -> RGB float 160x160 (raw 0-255).

    The reference uses MTCNN (facenet-pytorch) to re-detect and align the
    face inside the crop (deepfake_detection.py:376-383). The JAX MTCNN
    (models/mtcnn.py) is used when its converted weights are available;
    without weights this aligner resizes the crop directly — the documented
    behavioral deviation is only active in weightless environments, where
    the reference cannot run at all."""

    def __call__(self, face_bgr_clahe: np.ndarray) -> Optional[np.ndarray]:
        from ..utils.host_resize import resize_analysis
        rgb = np.ascontiguousarray(face_bgr_clahe[..., ::-1])
        return resize_analysis(rgb, 160, 160).astype(np.float32)


class DeepfakeDetector:
    """Reference-compatible orchestrator (deepfake_detection.py:292-726)."""

    def __init__(self, cfg: DetectorConfig = DetectorConfig(),
                 params=None, spec=None,
                 weights_path: Optional[str] = None,
                 ssd_weights_path: Optional[str] = None,
                 mtcnn_weights_path: Optional[str] = None,
                 enable_gradcam: bool = False, use_tta: Optional[bool] = None,
                 num_tta_augmentations: int = 1,
                 detection_threshold: Optional[float] = None,
                 face_weight: Optional[float] = None,
                 forensic_weight: Optional[float] = None):
        if detection_threshold is not None:
            cfg = cfg.with_threshold(detection_threshold)
        # The reference ctor takes fusion weights directly
        # (deepfake_detection.py:300-316); fold them into the config so both
        # serving modes (this single-stream path and serving/batcher.py's
        # batched tick) read ONE source of truth — cfg.face_weight.
        if face_weight is not None or forensic_weight is not None:
            import dataclasses
            cfg = dataclasses.replace(
                cfg,
                face_weight=cfg.face_weight if face_weight is None else face_weight,
                forensic_weight=(cfg.forensic_weight if forensic_weight is None
                                 else forensic_weight))
        self.cfg = cfg
        self.spec = spec if spec is not None else backbones.make("b0")
        self.enable_gradcam = enable_gradcam
        self.last_gradcams = []   # (bbox, heatmap) pairs from the last predict()
        self.use_tta = cfg.use_tta if use_tta is None else use_tta
        self.num_tta_augmentations = num_tta_augmentations
        self.detection_threshold = cfg.detection_threshold
        self.model_loaded = False
        self.checkpoint_meta = {}

        if params is not None:
            self.params = params
            self.model_loaded = True
        elif weights_path and os.path.exists(weights_path):
            # one dispatch for every checkpoint flavor: the reference .pth
            # (deepfake_detection.py:44-70) OR a trainer .npz (best-model
            # EMA params / full TrainState resume checkpoint)
            from ..utils.weights import load_params_and_meta
            self.params, self.checkpoint_meta = load_params_and_meta(
                weights_path, self.spec)
            self.model_loaded = True
        else:
            # Reference falls back to ImageNet-pretrained weights
            # (deepfake_detection.py:78-81); no pretrained artifact ships in
            # this environment, so random init + a loud flag.
            self.params = backbones.init_params(jax.random.PRNGKey(0), self.spec)

        self.face_detector = FaceDetector(
            ssd_weights_path=ssd_weights_path,
            confidence_threshold=cfg.ssd_confidence_threshold,
            min_face_px=cfg.min_face_px, backend=cfg.face_backend)

        self.aligner = None
        if mtcnn_weights_path and os.path.exists(mtcnn_weights_path):
            from ..models.mtcnn import MTCNNAligner
            self.aligner = MTCNNAligner.from_weights(mtcnn_weights_path)
        if self.aligner is None:
            self.aligner = _ResizeAligner()

        self.temporal_tracker = TemporalTracker(
            window_size=cfg.tracker.window_size,
            high_confidence_threshold=cfg.tracker.high_confidence_threshold,
            voting_window=cfg.tracker.voting_window,
            detection_threshold=cfg.detection_threshold)

        self.frame_count = 0
        self.full_forensic_interval = cfg.full_forensic_interval
        self.forensic_state: ForensicState = forensic_state_init(cfg.forensic)
        self.last_frame_forensic_result = None

        # Optional isotonic calibrator (deepfake_detection.py:334-342):
        # weights/calibrator.pkl in the package dir or the working directory
        # (where `rtvdd-train --fit-calibrator` writes it); accepts both the
        # IsotonicCalibrator dict format and a pickled calibrator object
        # (the reference's sklearn pickle).
        from ..train.calibration import load_default
        self.calibrator = load_default()

        self._jit_forensic = jax.jit(forensics.analyze_frame)

    # Reference-API attributes (deepfake_detection.py:315-316) — views of
    # the single config source of truth. The reference exposes them as
    # plain instance attributes, so assignment must keep working: setters
    # write through to cfg so the batched tick and the single-stream path
    # stay in agreement.
    @property
    def face_weight(self) -> float:
        return self.cfg.face_weight

    @face_weight.setter
    def face_weight(self, v: float) -> None:
        import dataclasses
        self.cfg = dataclasses.replace(self.cfg, face_weight=float(v))

    @property
    def forensic_weight(self) -> float:
        return self.cfg.forensic_weight

    @forensic_weight.setter
    def forensic_weight(self, v: float) -> None:
        import dataclasses
        self.cfg = dataclasses.replace(self.cfg, forensic_weight=float(v))

    # ------------------------------------------------------------------ state

    def reset(self) -> None:
        """(deepfake_detection.py:344-355)."""
        self.temporal_tracker.reset()
        self.frame_count = 0
        self.forensic_state = forensic_state_reset(self.forensic_state)
        self.last_frame_forensic_result = None

    # -------------------------------------------------------------- forensics

    def analyze_frame_forensics(self, frame_bgr: np.ndarray) -> dict:
        """Adaptive full/fast scheduling (deepfake_detection.py:504-515)."""
        full = self.frame_count % self.full_forensic_interval == 0
        h, w = self.cfg.forensic.analysis_size
        from ..utils.host_resize import resize_analysis
        resized = resize_analysis(frame_bgr, h, w)
        res, self.forensic_state = self._jit_forensic(
            jnp.asarray(resized), self.forensic_state, jnp.asarray(full))
        if full:
            keys = ["frequency", "noise", "ela", "edge", "color", "temporal"]
        else:
            keys = ["frequency", "temporal", "edge"]
        result = {
            "scores": {k: float(res[k]) for k in keys},
            "fake_probability": float(res["fake_probability"]),
            "analysis_type": "frame_forensic" if full else "frame_forensic_fast",
            "frame_number": int(res["frame_number"]),
        }
        self.last_frame_forensic_result = result
        return result

    # ------------------------------------------------------------- face path

    def _single_prediction(self, face_bgr: np.ndarray) -> Optional[float]:
        """(deepfake_detection.py:372-406)."""
        try:
            aligned = self.aligner(face_bgr)   # RGB float (160,160,3), raw 0-255
            if aligned is None:
                return None
            probs = classify_batch(self.params, jnp.asarray(aligned)[None],
                                   self.spec, self.cfg.model_input_size,
                                   self.cfg.bf16_inference)
            return float(probs[0])
        except Exception:
            return None

    def apply_calibration(self, raw_prob: float) -> float:
        if self.calibrator is None:
            return raw_prob
        try:
            return float(self.calibrator.predict_proba([[raw_prob]])[0][1])
        except Exception:
            return raw_prob

    def analyze_frequency_domain(self, face_bgr: np.ndarray) -> float:
        """High-frequency-deficit boost (deepfake_detection.py:457-487 —
        dead code in the reference serving path, kept for API completeness):
        masks the central low-frequency square of the FFT magnitude and
        returns 0.15 when the high-frequency energy ratio is < 0.15."""
        try:
            from ..ops.color import bgr_to_gray_u8
            gray = bgr_to_gray_u8(jnp.asarray(face_bgr)).astype(jnp.float32)
            mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(gray)))
            h, w = mag.shape
            ch, cw = h // 2, w // 2
            m = min(h, w) // 4
            ys = jnp.arange(h)[:, None]
            xs = jnp.arange(w)[None, :]
            center = ((ys >= ch - m) & (ys < ch + m)
                      & (xs >= cw - m) & (xs < cw + m))
            high = jnp.sum(jnp.where(center, 0.0, mag))
            total = jnp.sum(mag)
            ratio = float(high / (total + 1e-10))
            return 0.15 if ratio < 0.15 else 0.0
        except Exception:
            return 0.0

    def apply_heuristics(self, fake_prob: float, face_bgr: np.ndarray) -> float:
        h, w = face_bgr.shape[:2]
        return apply_small_face_heuristic(
            fake_prob, h, w, self.cfg.small_face_px, self.cfg.small_face_boost)

    def analyze_face(self, face_bgr: np.ndarray):
        """Returns (fake_prob, fake_prob, gradcam) or (None, None, None)
        (deepfake_detection.py:517-550). `gradcam` is a (224, 224) float
        heatmap in [0, 1] when `enable_gradcam=True` (the reference imports
        pytorch_grad_cam but ships it permanently disabled, :543-544; here
        the flag actually works — models/gradcam.py), else None."""
        try:
            preprocessed = preprocess_face_quality(face_bgr)
            if self.use_tta:
                fake_prob = self._tta_prediction(preprocessed)
            else:
                fake_prob = self._single_prediction(preprocessed)
            if fake_prob is None:
                return None, None, None
            fake_prob = self.apply_calibration(fake_prob)
            fake_prob = self.apply_heuristics(fake_prob, face_bgr)
            cam = self._gradcam(preprocessed) if self.enable_gradcam else None
            return fake_prob, fake_prob, cam
        except Exception as e:
            # The reference swallows face-analysis failures and falls back
            # to forensic-only fusion (deepfake_detection.py:548-550). Keep
            # that contract, but never SILENTLY: a persistent failure here
            # (e.g. a missing host dependency) changes verdict composition
            # for every frame, so the first occurrence warns with the cause.
            if not getattr(self, "_face_path_warned", False):
                self._face_path_warned = True
                import warnings
                warnings.warn(
                    "face analysis failed; verdicts degrade to "
                    f"forensic-only until the cause clears: {e!r}",
                    RuntimeWarning, stacklevel=2)
            return None, None, None

    def _gradcam(self, preprocessed_bgr: np.ndarray) -> Optional[np.ndarray]:
        """Heatmap over the aligned face the classifier actually saw."""
        try:
            aligned = self.aligner(preprocessed_bgr)
            if aligned is None:
                return None
            from ..models.gradcam import gradcam
            from .classify import preprocess_aligned
            x = preprocess_aligned(jnp.asarray(aligned, jnp.float32),
                                   self.cfg.model_input_size)
            return np.asarray(gradcam(self.params, x[None], self.spec)[0])
        except Exception:
            return None

    def _tta_prediction(self, face_bgr: np.ndarray) -> Optional[float]:
        """TTA: flip / brightness / small rotations, averaged
        (deepfake_detection.py:408-443). Off by default in serving."""
        import cv2
        import random
        preds = []
        p = self._single_prediction(face_bgr)
        if p is not None:
            preds.append(p)
        for _ in range(self.num_tta_augmentations - 1):
            aug = face_bgr.copy()
            if random.random() > 0.5:
                aug = cv2.flip(aug, 1)
            alpha = random.uniform(0.9, 1.1)
            aug = cv2.convertScaleAbs(aug, alpha=alpha, beta=0)
            angle = random.uniform(-3, 3)
            h, w = aug.shape[:2]
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            aug = cv2.warpAffine(aug, M, (w, h))
            p = self._single_prediction(aug)
            if p is not None:
                preds.append(p)
        return float(np.mean(preds)) if preds else None

    # ------------------------------------------------------------- main entry

    def predict(self, frame_bgr: np.ndarray):
        """Library entry point: all faces, annotated frame
        (deepfake_detection.py:588-686). NOTE: increments frame_count BEFORE
        forensics (library semantics, unlike the server path)."""
        self.frame_count += 1
        frame_forensic = self.analyze_frame_forensics(frame_bgr)
        faces = self.face_detector(frame_bgr)

        trigger_forensic = False
        forensic_frame = None
        face_results = []
        confidence_level = "UNCERTAIN"
        frame = frame_bgr.copy()
        # per-face (bbox, heatmap) pairs from the last predict() call when
        # enable_gradcam=True — consumers (cli/analyze.py --gradcam) blend
        # them over the annotated frame. The reference ships GradCAM
        # permanently disabled (deepfake_detection.py:543-544); here it works.
        self.last_gradcams = []

        if len(faces) > 0:
            for (x, y, w, h) in faces:
                face_region = frame_bgr[y:y + h, x:x + w]
                fake_prob, _, cam = self.analyze_face(face_region)
                if fake_prob is None:
                    continue
                if cam is not None:
                    self.last_gradcams.append(((x, y, w, h), cam))
                if self.cfg.fuse_forensics:
                    vote_prob = (self.cfg.face_weight * fake_prob
                                 + self.cfg.forensic_weight * frame_forensic["fake_probability"])
                else:
                    vote_prob = fake_prob   # reference: face-only (:620-623)
                self.temporal_tracker.update(vote_prob)
                confidence_level = self.temporal_tracker.get_confidence_level()
                if self.temporal_tracker.should_trigger_forensic_analysis():
                    trigger_forensic = True
                    forensic_frame = frame_bgr.copy()
                frame = self._draw_overlay(frame, x, y, w, h, fake_prob, confidence_level)
                face_results.append({
                    "face_prob": float(fake_prob),
                    "combined_prob": float(vote_prob),
                    "bbox": {"x": int(x), "y": int(y), "w": int(w), "h": int(h)},
                })
        else:
            frame_fake_prob = frame_forensic["fake_probability"]
            self.temporal_tracker.update(frame_fake_prob)
            confidence_level = self.temporal_tracker.get_confidence_level()
            if self.temporal_tracker.should_trigger_forensic_analysis():
                trigger_forensic = True
                forensic_frame = frame_bgr.copy()
            frame = self._draw_frame_overlay(frame, frame_fake_prob,
                                             confidence_level, frame_forensic)

        result_data = {
            "frame_count": self.frame_count,
            "faces_detected": len(faces),
            "face_results": face_results,
            "frame_forensic": frame_forensic,
            "confidence_level": confidence_level if faces or self.frame_count > 1 else "UNCERTAIN",
            "temporal_average": float(self.temporal_tracker.get_temporal_average()),
            "stability_score": float(self.temporal_tracker.get_stability_score()),
            "analysis_mode": "face+frame" if len(faces) > 0 else "frame_only",
        }
        return frame, trigger_forensic, forensic_frame, result_data

    # ---------------------------------------------------------------- drawing

    @staticmethod
    def get_box_color(confidence_level: str):
        return (0, 0, 255) if confidence_level == "FAKE" else (0, 255, 0)

    def _draw_overlay(self, frame, x, y, w, h, fake_prob, confidence_level):
        """Host-side annotation (deepfake_detection.py:559-586)."""
        import cv2
        color = self.get_box_color(confidence_level)
        cv2.rectangle(frame, (x, y), (x + w, y + h), color, 3)
        stats = self.temporal_tracker.get_voting_stats()
        if confidence_level == "FAKE":
            label = f"FAKE (Frame: {fake_prob*100:.0f}%)"
        else:
            label = f"REAL (Frame: {(1-fake_prob)*100:.0f}%)"
        (tw, _), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.7, 2)
        cv2.rectangle(frame, (x, y - 30), (x + tw + 10, y), color, -1)
        cv2.putText(frame, label, (x + 5, y - 10), cv2.FONT_HERSHEY_SIMPLEX,
                    0.7, (255, 255, 255), 2)
        if stats["total_frames"] > 0:
            info = (f"Votes: F:{stats['fake_count']} R:{stats['real_count']} "
                    f"(Last {stats['total_frames']} frames)")
            cv2.putText(frame, info, (x, y + h + 20), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, color, 1)
        return frame

    def _draw_frame_overlay(self, frame, fake_prob, confidence_level, forensic):
        """(deepfake_detection.py:688-726)."""
        import cv2
        h, w = frame.shape[:2]
        if confidence_level == "FAKE":
            color, label = (0, 0, 255), f"SUSPICIOUS ({fake_prob*100:.0f}%)"
        elif confidence_level == "REAL":
            color, label = (0, 255, 0), f"AUTHENTIC ({(1-fake_prob)*100:.0f}%)"
        else:
            color, label = (0, 200, 255), f"ANALYZING ({fake_prob*100:.0f}%)"
        cv2.rectangle(frame, (2, 2), (w - 2, h - 2), color, 2)
        overlay = frame.copy()
        cv2.rectangle(overlay, (0, 0), (w, 30), color, -1)
        cv2.addWeighted(overlay, 0.6, frame, 0.4, 0, frame)
        cv2.putText(frame, f"[Frame Analysis] {label}", (10, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        s = forensic.get("scores", {})
        txt = " | ".join([f"FFT:{s.get('frequency',0)*100:.0f}",
                          f"Noise:{s.get('noise',0)*100:.0f}",
                          f"ELA:{s.get('ela',0)*100:.0f}",
                          f"Edge:{s.get('edge',0)*100:.0f}"])
        cv2.putText(frame, txt, (10, h - 15), cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
        return frame


_default_detector: Optional[DeepfakeDetector] = None


def get_default_detector() -> DeepfakeDetector:
    """Lazy global with the reference's module-level defaults
    (deepfake_detection.py:730-736) — but constructed on first use, not at
    import (import-time model loading is a reference anti-pattern)."""
    global _default_detector
    if _default_detector is None:
        _default_detector = DeepfakeDetector(
            use_tta=False, num_tta_augmentations=1, detection_threshold=0.5)
    return _default_detector


def predict(frame):
    """Legacy shim (deepfake_detection.py:739-742)."""
    result_frame, _, _, _ = get_default_detector().predict(frame)
    return result_frame


def predict_with_forensics(frame):
    """Legacy shim (deepfake_detection.py:745-747)."""
    return get_default_detector().predict(frame)
