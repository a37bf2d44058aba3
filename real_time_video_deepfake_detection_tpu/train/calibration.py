"""Probability calibration (reference C7's optional isotonic calibrator,
deepfake_detection.py:334-342, 445-455 — the reference loads an sklearn
pickle that never ships; here the calibrator is self-contained).

Isotonic regression via pool-adjacent-violators, exposed with the
`predict_proba([[p]])[0][1]` surface the detector's apply_calibration
expects, plus fit/save/load helpers.
"""

from __future__ import annotations

import os
import pickle
from typing import Sequence

import numpy as np


class IsotonicCalibrator:
    """Monotone map from raw fake-probabilities to calibrated probabilities."""

    def __init__(self, x: np.ndarray | None = None,
                 y: np.ndarray | None = None):
        self.x_ = x
        self.y_ = y

    def fit(self, probs: Sequence[float], labels: Sequence[int]) -> "IsotonicCalibrator":
        p = np.asarray(probs, np.float64)
        t = np.asarray(labels, np.float64)
        order = np.argsort(p, kind="stable")
        xs, ys = p[order], t[order]

        # pool adjacent violators
        level_y = list(ys)
        level_w = [1.0] * len(ys)
        level_x = list(xs)
        i = 0
        vals = []
        for xi, yi in zip(level_x, level_y):
            vals.append([yi, 1.0, xi, xi])
            while len(vals) > 1 and vals[-2][0] >= vals[-1][0]:
                y2, w2, lo2, hi2 = vals.pop()
                y1, w1, lo1, hi1 = vals.pop()
                w = w1 + w2
                vals.append([(y1 * w1 + y2 * w2) / w, w, lo1, hi2])
        self.x_ = np.array([v[2] for v in vals] + [vals[-1][3]])
        self.y_ = np.array([v[0] for v in vals] + [vals[-1][0]])
        return self

    def transform(self, probs: np.ndarray) -> np.ndarray:
        if self.x_ is None:
            return np.asarray(probs)
        return np.interp(np.asarray(probs), self.x_, self.y_)

    # sklearn-compatible surface used by apply_calibration
    def predict_proba(self, rows):
        p = np.asarray(rows, np.float64).reshape(-1)
        cal = self.transform(p)
        return np.stack([1 - cal, cal], axis=1)

    def save(self, path: str) -> None:
        """Write the knots as an .npz payload (two float arrays) regardless
        of filename — the reference-convention name `calibrator.pkl` is
        kept for drop-in layout parity, but auto-load never needs to
        unpickle (round-3 advisor: pickle.load from the serving CWD is an
        arbitrary-code-execution surface)."""
        with open(path, "wb") as f:
            np.savez(f, x=np.asarray(self.x_), y=np.asarray(self.y_))

    @classmethod
    def load(cls, path: str, allow_pickle: bool = False) -> "IsotonicCalibrator":
        """Load knots. .npz payloads load with allow_pickle=False always;
        a legacy pickle file additionally requires allow_pickle=True (only
        pass it for operator-supplied trusted files, never auto-load)."""
        try:
            with np.load(path, allow_pickle=False) as d:
                return cls(np.array(d["x"]), np.array(d["y"]))
        except Exception as e:
            # Only numpy's explicit pickled-data refusal means "this is a
            # legacy pickle file". Anything else (truncated zip, missing
            # keys, IO error) is CORRUPTION — report it as such instead of
            # steering the operator toward allow_pickle=True on a file
            # that was never a calibrator payload.
            if not (isinstance(e, ValueError) and "pickle" in str(e).lower()):
                raise ValueError(
                    f"{path}: corrupt/unreadable calibrator payload "
                    f"({type(e).__name__}: {e}); re-fit with "
                    "`rtvdd-train --fit-calibrator`") from e
        if not allow_pickle:
            raise ValueError(
                f"{path} is not an .npz calibrator payload; legacy pickle "
                "files need IsotonicCalibrator.load(path, allow_pickle=True) "
                "(trusted files only) or a re-fit with "
                "`rtvdd-train --fit-calibrator`")
        with open(path, "rb") as f:
            d = pickle.load(f)
        if isinstance(d, dict) and "x" in d:
            return cls(d["x"], d["y"])
        return d  # a pickled calibrator object


def fit_calibrator_from_validation(params, spec, loader, out_path: str):
    """Fit on validation predictions and save (usable as the detector's
    weights/calibrator.pkl)."""
    import jax
    import jax.numpy as jnp
    from ..models.backbones import forward
    from .augment import eval_preprocess_batch

    eval_fn = jax.jit(lambda p, x: jax.nn.sigmoid(
        forward(p, x, spec, train=False)[:, 0]))
    probs, labels = [], []
    for imgs, lab in loader:
        x = eval_preprocess_batch(jnp.asarray(imgs))
        probs.append(np.asarray(eval_fn(params, x)))
        labels.append(lab)
    cal = IsotonicCalibrator().fit(np.concatenate(probs), np.concatenate(labels))
    cal.save(out_path)
    return cal


def load_default():
    """The detector/engine's optional calibrator: weights/calibrator.pkl in
    the package dir (the reference's repo-relative convention,
    deepfake_detection.py:334-342) or the working directory (where
    `rtvdd-train --fit-calibrator` writes it). None when absent/unreadable."""
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_cal = os.path.join(base, "weights", "calibrator.pkl")
    for cal in (pkg_cal,
                os.path.join("weights", "calibrator.pkl"),
                # `rtvdd-train --output-dir D --fit-calibrator` writes
                # D/calibrator.pkl; serving with CWD=D must find it
                "calibrator.pkl"):
        if os.path.exists(cal):
            try:
                # Auto-load NEVER unpickles: CWD files must be the .npz
                # payload save() writes. A legacy pickle inside the package
                # weights dir (shipped next to the code, not
                # attacker-writable like a dataset CWD) is the one trusted
                # exception.
                loaded = IsotonicCalibrator.load(
                    cal, allow_pickle=(cal == pkg_cal))
            except ValueError as e:
                import logging
                # echo load()'s own diagnosis — it distinguishes a legacy
                # pickle file (not auto-loaded from a CWD) from a corrupt
                # .npz payload
                logging.getLogger(__name__).warning(
                    "ignoring calibrator %s: %s", os.path.abspath(cal), e)
                continue
            except Exception:
                continue
            # Loud by design: an auto-loaded calibrator remaps every served
            # fake_probability (it is compiled into the batched tick), so a
            # stale calibrator.pkl left in the CWD must be visible in logs.
            import logging
            logging.getLogger(__name__).warning(
                "probability calibrator auto-loaded from %s — applied to "
                "ALL face probabilities; delete the file or move it to "
                "disable", os.path.abspath(cal))
            return loaded
    return None
