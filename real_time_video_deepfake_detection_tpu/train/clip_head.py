"""Temporal-attention head training (BASELINE config 5).

The clip head (models/temporal_head.py) replaces the reference's 10-frame
majority vote (deepfake_detection.py:146-196) with a learned verdict over a
window of per-frame backbone features. This module trains it on clips of
features: extract features once with the frozen backbone (the expensive
part, batched on the MXU), then fit the small head with focal loss — the
same objective the reference trainer uses for the frame classifier
(train.py:360-392).

Typical use:
    feats = extract_clip_features(params_b0, spec, clips_u8)   # (N,T,1280)
    head, log = train_clip_head(key, feats, labels, hspec)
    save via train/checkpoint.save_checkpoint -> serve with
    `--batched --clip-window T --clip-head head.npz`.

Or the operator path over labeled video directories
(`<root>/{train[,val]}/{real,fake}/*.mp4`):
    python -m real_time_video_deepfake_detection_tpu.train.clip_head \
        --videos root --clip-window 16 --backbone-weights best.npz \
        --out clip_head.npz
"""

from __future__ import annotations

import argparse
import json
import os
from functools import partial
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import backbones
from ..models import temporal_head as th
from ..models.efficientnet import EfficientNetSpec
from ..pipeline.classify import preprocess_aligned
from .losses import focal_loss_with_smoothing


def extract_clip_features(backbone_params, spec,
                          clips_rgb_raw: jax.Array,
                          batch_frames: int = 256) -> jax.Array:
    """(N, T, H, W, 3) raw-RGB face crops -> (N, T, feat) pooled backbone
    features, frozen backbone, chunked so any N*T fits device memory.
    `spec` is any backbones.make() spec (config-5 swap)."""
    n, t = clips_rgb_raw.shape[:2]
    flat = clips_rgb_raw.reshape((n * t,) + clips_rgb_raw.shape[2:])

    @jax.jit
    def run(chunk):
        x = jax.vmap(lambda f: preprocess_aligned(f.astype(jnp.float32)))(chunk)
        return backbones.extract_features(backbone_params, x, spec,
                                          train=False)

    outs = []
    for i in range(0, n * t, batch_frames):
        outs.append(run(flat[i:i + batch_frames]))
    feats = jnp.concatenate(outs, axis=0)
    return feats.reshape(n, t, feats.shape[-1])


@partial(jax.jit, static_argnums=(4, 5))
def _step(params, opt_state, feats, labels, hspec: th.TemporalHeadSpec, tx):
    mask = jnp.ones(feats.shape[:2], bool)

    def loss_fn(p):
        logits = th.forward(p, feats, mask, hspec)
        return focal_loss_with_smoothing(logits, labels), logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    acc = jnp.mean(((jax.nn.sigmoid(logits) > 0.5) == (labels > 0.5)))
    return params, opt_state, loss, acc


def train_clip_head(key: jax.Array, feats: jax.Array, labels: jax.Array,
                    hspec: th.TemporalHeadSpec, epochs: int = 30,
                    batch_size: int = 32, lr: float = 1e-3,
                    ) -> Tuple[Dict, list]:
    """feats: (N, T, D) float32; labels: (N,) {0,1}. Returns (params, log).

    batch_size is clamped to N so small feature sets still take optimizer
    steps instead of silently returning random-init params (the empty-range
    epoch would also log NaN means)."""
    n = feats.shape[0]
    if n == 0:
        raise ValueError("train_clip_head: empty feature set")
    batch_size = min(batch_size, n)
    params = th.init_params(key, hspec)
    tx = optax.adamw(lr, weight_decay=1e-4)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    log = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            params, opt_state, loss, acc = _step(
                params, opt_state, feats[idx], labels[idx], hspec, tx)
            losses.append(float(loss))
            accs.append(float(acc))
        log.append({"epoch": epoch, "loss": float(np.mean(losses)),
                    "acc": float(np.mean(accs))})
    return params, log


# ------------------------------------------------------------ operator CLI

def _clip_from_video(path: str, t: int, face_detector, crop_size: int):
    """Sample `t` frames uniformly in the video's 5-95% span (the trainer's
    pre-extraction convention, train.py:128-161), crop the first detected
    face per frame (whole frame when none), resize to `crop_size`, RGB.
    Returns (t, crop, crop, 3) u8 or None when the video yields nothing."""
    import cv2

    from ..utils.host_resize import resize_analysis

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if n <= 0:
        cap.release()
        return None
    lo, hi = 0.05 * n, max(0.95 * n - 1, 0.05 * n)
    idxs = np.unique(np.linspace(lo, hi, t).astype(int))
    frames = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ret, f = cap.read()
        if not ret:
            continue
        boxes = face_detector(f)
        crop = f
        if boxes:
            x, y, w, h = boxes[0]
            candidate = f[y:y + h, x:x + w]
            if candidate.size:
                crop = candidate
        crop = resize_analysis(crop, crop_size, crop_size)
        frames.append(crop[..., ::-1])   # BGR -> RGB raw values
    cap.release()
    if not frames:
        return None
    while len(frames) < t:               # short video: repeat the last frame
        frames.append(frames[-1])
    return np.stack(frames[:t])


def _build_split(root: str, split: str, t: int, face_detector, crop_size: int):
    clips, labels = [], []
    for label, y in (("real", 0.0), ("fake", 1.0)):
        d = os.path.join(root, split, label)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            c = _clip_from_video(os.path.join(d, name), t, face_detector,
                                 crop_size)
            if c is not None:
                clips.append(c)
                labels.append(y)
    if not clips:
        return None, None
    return np.stack(clips), np.asarray(labels, np.float32)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Train the clip-attention verdict head (config 5) from "
                    "labeled videos")
    p.add_argument("--videos", required=True,
                   help="dir with train/{real,fake}/*.mp4 (val/ optional)")
    p.add_argument("--clip-window", type=int, default=16)
    p.add_argument("--backbone", default="b0",
                   choices=backbones.backbone_names())
    p.add_argument("--backbone-weights", default=None,
                   help="frozen feature extractor: best_model.pth or .npz "
                        "(random init without — features are then arbitrary)")
    p.add_argument("--crop-size", type=int, default=160,
                   help="face-crop side fed to the backbone (the serving "
                        "aligner's output size)")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="clip_head.npz")
    args = p.parse_args(argv)

    from ..pipeline.faces import FaceDetector
    from .checkpoint import save_checkpoint

    spec = backbones.make(args.backbone)
    bparams = backbones.init_params(jax.random.PRNGKey(args.seed), spec)
    if args.backbone_weights:
        if args.backbone_weights.endswith(".pth"):
            from ..utils.torch_convert import load_checkpoint as load_torch
            bparams, _ = load_torch(args.backbone_weights, spec)
        else:
            from .checkpoint import load_checkpoint as load_tree
            st, _, _ = load_tree(args.backbone_weights,
                                 restore_host_rng=False)
            bparams = st.params if hasattr(st, "params") else st

    fd = FaceDetector()
    t = args.clip_window
    clips, labels = _build_split(args.videos, "train", t, fd, args.crop_size)
    if clips is None:
        raise SystemExit(f"no usable videos under {args.videos}/train")
    print(f"  [clip-head] {len(clips)} train clips x {t} frames")
    feats = extract_clip_features(bparams, spec, jnp.asarray(clips))

    hspec = th.TemporalHeadSpec(feature_dim=backbones.feature_dim(spec),
                                window=t)
    params, log = train_clip_head(
        jax.random.PRNGKey(args.seed + 1), feats,
        jnp.asarray(labels), hspec, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr)

    result = {"train_log_tail": log[-3:]}
    vclips, vlabels = _build_split(args.videos, "val", t, fd, args.crop_size)
    if vclips is not None:
        vfeats = extract_clip_features(bparams, spec, jnp.asarray(vclips))
        mask = jnp.ones(vfeats.shape[:2], bool)
        probs = np.asarray(jax.nn.sigmoid(th.forward(params, vfeats, mask,
                                                     hspec)))
        result["val_acc"] = float(((probs > 0.5) == (vlabels > 0.5)).mean())
        result["val_n"] = int(len(vlabels))

    save_checkpoint(args.out, params,
                    {"hspec": {"feature_dim": hspec.feature_dim,
                               "window": hspec.window, "dim": hspec.dim,
                               "depth": hspec.depth, "heads": hspec.heads},
                     "backbone": args.backbone, "epochs": args.epochs})
    result["saved"] = args.out
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
