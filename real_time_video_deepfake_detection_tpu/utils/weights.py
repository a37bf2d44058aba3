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


def load_params_any(path: Optional[str], spec) -> Optional[Any]:
    """Load classifier params from `path` (.pth or .npz); None when no path.

    Raises SystemExit with an operator-readable message on a .pth with a
    non-EfficientNet spec (the reference torch format only describes B0).
    """
    if not path:
        return None
    if path.endswith(".pth"):
        from ..models.efficientnet import EfficientNetSpec
        if not isinstance(spec, EfficientNetSpec):
            raise SystemExit("--weights *.pth is the reference torch "
                             "EfficientNet format; save other backbones "
                             "as .npz via the trainer")
        from .torch_convert import load_checkpoint as load_torch
        params, _ = load_torch(path, spec)
        return params
    from ..train.checkpoint import load_checkpoint as load_tree
    tree, _, _ = load_tree(path, restore_host_rng=False)
    if hasattr(tree, "ema_params"):
        # a full TrainState resume checkpoint: serve the EMA weights,
        # matching what validation scored and best.npz would contain
        return tree.ema_params
    if hasattr(tree, "params"):   # pragma: no cover - future state shapes
        return tree.params
    return tree
