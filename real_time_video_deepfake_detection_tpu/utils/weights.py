"""Shared --weights loader for the serving/analyze CLIs.

One dispatch for every checkpoint flavor an operator can point at:

- ``best_model.pth`` — the reference's torch checkpoint
  (deepfake_detection.py:44-70 schema), via the torch converter. Only
  valid for EfficientNet specs (the reference has no other backbone).
- a trainer ``best.npz`` — a bare params pytree (what
  train/trainer.py saves as the best model: EMA weights).
- a trainer RESUME checkpoint — a full ``TrainState``
  (params/opt_state/ema_params/step/rng); serving wants the EMA
  parameters, the weights validation/best-model selection used
  (train.py:992-999 semantics). Previously this was handed to the
  engine verbatim and failed with an opaque shape error deep inside
  the first forward.
"""

from __future__ import annotations

from typing import Any, Optional


def load_params_and_meta(path: str, spec) -> tuple[Any, dict]:
    """Load (classifier params, checkpoint metadata) from `path`.

    Metadata carries 'epoch'/'val_acc'/'config' when the checkpoint has
    them — the reference exposes these on its loaded model
    (deepfake_detection.py:64-70); the trainer's .npz checkpoints record
    the same keys (train/trainer.py best/resume saves).

    Raises SystemExit with an operator-readable message on a .pth with a
    non-EfficientNet spec (the reference torch format only describes B0).
    """
    if path.endswith(".pth"):
        from ..models.efficientnet import EfficientNetSpec
        if not isinstance(spec, EfficientNetSpec):
            raise SystemExit("--weights *.pth is the reference torch "
                             "EfficientNet format; save other backbones "
                             "as .npz via the trainer")
        from .torch_convert import load_checkpoint as load_torch
        return load_torch(path, spec)
    from ..train.checkpoint import load_checkpoint as load_tree
    tree, meta, _ = load_tree(path, restore_host_rng=False)
    meta = {k: meta[k] for k in ("epoch", "val_acc", "config")
            if isinstance(meta, dict) and k in meta}
    if hasattr(tree, "ema_params"):
        # a full TrainState resume checkpoint: serve the EMA weights,
        # matching what validation scored and best.npz would contain
        return tree.ema_params, meta
    if hasattr(tree, "params"):   # pragma: no cover - future state shapes
        return tree.params, meta
    return tree, meta


def load_params_any(path: Optional[str], spec) -> Optional[Any]:
    """Load classifier params from `path` (.pth or .npz); None when no path."""
    if not path:
        return None
    return load_params_and_meta(path, spec)[0]
