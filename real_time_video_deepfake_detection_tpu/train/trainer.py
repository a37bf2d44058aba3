"""Training driver: epoch loop, validation, checkpoints, CLI.

Reference parity (train.py:770-1138): balanced sampler, fused
augment+mixup+focal step, EMA-weighted validation, best-model selection on
F1, JSON epoch log, atomic per-epoch resume checkpoints incl. RNG state,
graceful SIGINT (first = finish epoch and save; second = abort), early
stopping, resume-by-rerunning-the-same-command.

TPU-first differences: augmentation/mixup run inside the jitted step (see
train/steps.py:fused_train_step), bf16-friendly, data-parallel over a
("data",) mesh when more than one device is present.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import TrainConfig
from ..models import backbones
from ..models.backbones import forward
from .checkpoint import load_checkpoint, save_checkpoint
from .data import BatchLoader, DeepfakeDataset
from .augment import eval_preprocess_batch
from .losses import focal_loss_with_smoothing
from ..parallel.mesh import batch_sharded, make_mesh, replicated
from .steps import (
    TrainState, fused_train_step, init_train_state, make_optimizer,
    make_sharded_train_step,
)

_stop_requested = False


def _sigint_handler(signum, frame):
    """(train.py:79-94)."""
    global _stop_requested
    if _stop_requested:
        print("\nSecond interrupt — aborting immediately.")
        raise KeyboardInterrupt
    _stop_requested = True
    print("\nStop requested — will save and exit after this epoch. "
          "Press Ctrl-C again to abort without saving.")


def auc_score(labels: np.ndarray, probs: np.ndarray) -> float:
    """Rank-based ROC AUC (no sklearn dependency)."""
    order = np.argsort(probs, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(probs) + 1)
    # average ranks for ties
    sorted_p = probs[order]
    i = 0
    while i < len(sorted_p):
        j = i
        while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    pos = labels == 1
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return 0.0
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def validate(params, loader: BatchLoader, spec,
             cfg: TrainConfig):
    """(train.py:632-679): loss, acc, per-class acc, P/R/F1, AUC."""
    eval_fn = jax.jit(lambda p, x: jax.nn.sigmoid(
        forward(p, x, spec, train=False)[:, 0]))
    probs_all, labels_all, loss_sum, n = [], [], 0.0, 0
    loss_fn = jax.jit(lambda p, x, y: focal_loss_with_smoothing(
        forward(p, x, spec, train=False)[:, 0], y,
        cfg.focal_gamma, cfg.focal_alpha, cfg.label_smoothing))
    for imgs, labels in loader:
        x = eval_preprocess_batch(jnp.asarray(imgs))
        pr = np.asarray(eval_fn(params, x))
        loss_sum += float(loss_fn(params, x, jnp.asarray(labels))) * len(labels)
        n += len(labels)
        probs_all.append(pr)
        labels_all.append(labels)
    probs = np.concatenate(probs_all)
    labels = np.concatenate(labels_all)
    preds = (probs > 0.5).astype(np.float32)
    acc = float((preds == labels).mean())
    real_m, fake_m = labels == 0, labels == 1
    real_acc = float((preds[real_m] == 0).mean()) if real_m.any() else 0.0
    fake_acc = float((preds[fake_m] == 1).mean()) if fake_m.any() else 0.0
    tp = float(((preds == 1) & (labels == 1)).sum())
    fp = float(((preds == 1) & (labels == 0)).sum())
    fn = float(((preds == 0) & (labels == 1)).sum())
    precision = tp / (tp + fp + 1e-10)
    recall = tp / (tp + fn + 1e-10)
    f1 = 2 * precision * recall / (precision + recall + 1e-10)
    auc = auc_score(labels, probs)
    print(f"  Val Acc: {acc*100:.1f}% (Real: {real_acc*100:.1f}%, "
          f"Fake: {fake_acc*100:.1f}%) | F1: {f1:.4f} | AUC: {auc:.4f} "
          f"| Prec: {precision:.3f} Rec: {recall:.3f}")
    return {"loss": loss_sum / max(n, 1), "acc": acc, "real_acc": real_acc,
            "fake_acc": fake_acc, "precision": precision, "recall": recall,
            "f1": f1, "auc": auc}


def train(args) -> dict:
    global _stop_requested
    _stop_requested = False
    signal.signal(signal.SIGINT, _sigint_handler)

    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        image_size=args.image_size, seed=args.seed,
        early_stop_patience=args.patience, bf16_compute=args.bf16,
        weight_decay=args.weight_decay, head_dropout=args.dropout,
        label_smoothing=args.label_smoothing,
        mixup_alpha=args.mixup_alpha, cutmix_alpha=args.cutmix_alpha,
        focal_gamma=args.focal_gamma, focal_alpha=args.focal_alpha,
        ema_decay=args.ema_decay, backbone_lr_mult=args.backbone_lr_mult,
        freeze_frac=args.freeze_frac, clip_norm=args.clip_norm,
        bn_momentum=args.bn_momentum)
    # Backbone swap (config 5): b0..b7 / vit_s16|b16|l16 / xception behind
    # the same trainer interface (models/backbones.py dispatch).
    spec = backbones.make(args.backbone, image_size=cfg.image_size)

    out_dir = args.output_dir
    os.makedirs(out_dir, exist_ok=True)
    resume_path = os.path.join(out_dir, "resume_checkpoint.npz")
    best_path = os.path.join(out_dir, "best_model.npz")
    log_path = os.path.join(out_dir, "training_log.json")

    train_ds = DeepfakeDataset(args.dataset, "train", cfg.image_size)
    val_ds = DeepfakeDataset(args.dataset, "val", cfg.image_size)
    print(f"  [train] {len(train_ds)} samples {tuple(train_ds.class_counts)}; "
          f"[val] {len(val_ds)} samples")
    n_workers = getattr(args, "num_workers", 8)
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed, balanced=True,
                               num_workers=n_workers)
    val_loader = BatchLoader(val_ds, cfg.batch_size, shuffle=False,
                             drop_last=False, num_workers=n_workers)

    steps_per_epoch = max(len(train_loader), 1)
    total_steps = steps_per_epoch * cfg.epochs
    tx = make_optimizer(cfg, total_steps, spec=spec)

    params = backbones.init_params(jax.random.PRNGKey(cfg.seed), spec)
    if getattr(args, "pretrained", None) and not args.warm_start:
        from ..models.efficientnet import EfficientNetSpec
        if not isinstance(spec, EfficientNetSpec):
            raise ValueError("--pretrained loads an ImageNet EfficientNet "
                             ".pth; use --warm-start with an .npz pytree "
                             "for other backbones")
        path = args.pretrained
        if path == "auto":
            # Each efficientnet_pytorch release file embeds its own
            # sha256[:8] suffix (b0 is 355c32eb, b4 is 6ed6700e, ...), so
            # resolve by variant glob rather than pinning one hash.
            import glob as _glob
            cands = sorted(
                c for d in (args.output_dir, "weights")
                for c in _glob.glob(
                    os.path.join(d, f"efficientnet-{spec.variant}-*.pth")))
            if not cands:
                raise FileNotFoundError(
                    f"--pretrained: no ImageNet efficientnet-{spec.variant}"
                    f"-*.pth found in {args.output_dir} or weights/; fetch "
                    "the b0 artifact with `rtvdd-fetch-weights --only "
                    "effnet_b0_imagenet` (other variants: download the "
                    "efficientnet_pytorch release file) or pass an "
                    "explicit path")
            path = cands[0]
        from ..utils.torch_convert import load_imagenet_checkpoint
        params = load_imagenet_checkpoint(
            path, spec, jax.random.PRNGKey(cfg.seed))
        print(f"  ImageNet-pretrained backbone from {path} "
              f"(fresh {spec.head_filters}->512->256->1 head, "
              f"reference model.py:40-61 init)")
    if args.warm_start and os.path.exists(args.warm_start):
        if args.warm_start.endswith(".pth"):
            from ..models.efficientnet import EfficientNetSpec
            if not isinstance(spec, EfficientNetSpec):
                raise ValueError(".pth warm-start is the reference "
                                 "EfficientNet checkpoint format; use an "
                                 ".npz pytree for other backbones")
            from ..utils.torch_convert import load_checkpoint as load_torch
            params, _ = load_torch(args.warm_start, spec)
        else:
            st, _, _ = load_checkpoint(args.warm_start, restore_host_rng=False)
            params = st.params if isinstance(st, TrainState) else st
        print(f"  Warm-started from {args.warm_start}")

    state = init_train_state(params, cfg, total_steps, cfg.seed, tx=tx)
    start_epoch = 0
    best = {"f1": -1.0, "acc": 0.0}
    training_log = []

    if not args.fresh and os.path.exists(resume_path):
        state, meta, _ = load_checkpoint(resume_path)
        start_epoch = meta["epoch"] + 1
        best = meta["best"]
        training_log = meta.get("training_log", [])
        print(f"  Resumed from epoch {meta['epoch']} "
              f"(best F1 {best['f1']:.4f})")

    # Data-parallel over a ("data",) mesh when more than one device is
    # usable: params/opt state replicated, batch sharded on the data axis,
    # grad all-reduce inserted by XLA over ICI (SURVEY.md §2.3). Falls back
    # to the largest device count that divides the batch size.
    n_dev = getattr(args, "num_devices", 0) or len(jax.devices())
    n_dev = min(n_dev, len(jax.devices()))
    while cfg.batch_size % n_dev:
        n_dev -= 1
    if n_dev > 1:
        mesh = make_mesh(n_dev)
        step_fn = make_sharded_train_step(mesh, spec, cfg, tx,
                                          step=fused_train_step)
        state = jax.device_put(state, replicated(mesh))
        data_sharding = batch_sharded(mesh)

        def to_device(a):
            return jax.device_put(jnp.asarray(a), data_sharding)
        print(f"  Data-parallel over {n_dev} devices "
              f"(per-device batch {cfg.batch_size // n_dev})")
    else:
        step_fn = jax.jit(partial(fused_train_step, spec=spec, cfg=cfg, tx=tx),
                          donate_argnums=(0,))
        to_device = jnp.asarray

    epochs_no_improve = 0
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        losses, accs, seen = [], [], 0
        for imgs, labels in train_loader:
            if _stop_requested:
                break
            state, metrics = step_fn(state, to_device(imgs), to_device(labels))
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["accuracy"]))
            seen += len(labels)
        train_loss = float(np.mean(losses)) if losses else 0.0
        train_acc = float(np.mean(accs)) if accs else 0.0

        # validate with EMA weights (train.py:992-999)
        val = validate(state.ema_params, val_loader, spec, cfg)

        entry = {"epoch": epoch, "train_loss": train_loss,
                 "train_acc": train_acc, "epoch_seconds": time.time() - t0,
                 **{f"val_{k}": v for k, v in val.items()}}
        training_log.append(entry)
        with open(log_path, "w") as f:
            json.dump(training_log, f, indent=2)
        print(f"Epoch {epoch}: loss {train_loss:.4f} acc {train_acc*100:.1f}% "
              f"| val F1 {val['f1']:.4f} ({entry['epoch_seconds']:.0f}s)")

        if val["f1"] > best["f1"]:
            best = {"f1": val["f1"], "acc": val["acc"], "epoch": epoch}
            save_checkpoint(best_path, state.ema_params,
                            {"epoch": epoch, "val_acc": val["acc"],
                             "val_f1": val["f1"], "config": vars(args)})
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1

        save_checkpoint(resume_path, state,
                        {"epoch": epoch, "best": best,
                         "training_log": training_log, "args": vars(args)},
                        jax_rng_key=state.rng)

        if _stop_requested:
            print("  Stopped by request; checkpoint saved.")
            break
        if epochs_no_improve >= cfg.early_stop_patience:
            print(f"  Early stopping after {epochs_no_improve} epochs "
                  f"without F1 improvement.")
            break

    if getattr(args, "fit_calibrator", False):
        # isotonic calibration on validation predictions of the final EMA
        # weights (the reference's optional weights/calibrator.pkl — a file
        # its repo references but never ships a fit path for)
        from .calibration import fit_calibrator_from_validation
        cal_path = os.path.join(out_dir, "calibrator.pkl")
        fit_calibrator_from_validation(state.ema_params, spec, val_loader,
                                       cal_path)
        print(f"  Calibrator saved to {cal_path}")

    return {"best": best, "log": training_log}


def main(argv=None):
    # CLI defaults single-sourced from TrainConfig, which carries the
    # reference's train.py:1090-1138 defaults with file:line citations.
    d = TrainConfig()
    p = argparse.ArgumentParser(description="Train the deepfake classifier (TPU)")
    p.add_argument("--dataset", required=True,
                   help="dir with train/{real,fake} and val/{real,fake}")
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--batch-size", type=int, default=d.batch_size)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--image-size", type=int, default=d.image_size)
    from ..models.backbones import backbone_names
    p.add_argument("--backbone", default="b0", choices=backbone_names(),
                   help="classifier backbone (config 5 swap): EfficientNet "
                        "b0..b7, vit_s16/b16/l16, or xception")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--patience", type=int, default=d.early_stop_patience)
    # hyperparameter tunables (reference train.py:1099-1125 flag surface)
    p.add_argument("--weight-decay", type=float, default=d.weight_decay)
    p.add_argument("--dropout", type=float, default=d.head_dropout,
                   help="classifier-head base dropout; second/third head "
                        "dropouts are 0.7x/0.5x of it (model.py:51-59)")
    p.add_argument("--label-smoothing", type=float, default=d.label_smoothing)
    p.add_argument("--mixup-alpha", type=float, default=d.mixup_alpha)
    p.add_argument("--cutmix-alpha", type=float, default=d.cutmix_alpha)
    p.add_argument("--focal-gamma", type=float, default=d.focal_gamma)
    p.add_argument("--focal-alpha", type=float, default=d.focal_alpha)
    p.add_argument("--ema-decay", type=float, default=d.ema_decay)
    p.add_argument("--backbone-lr-mult", type=float, default=d.backbone_lr_mult,
                   help="differential LR: backbone groups train at this "
                        "multiple of --lr (train.py:891-910)")
    p.add_argument("--freeze-frac", type=float, default=d.freeze_frac,
                   help="freeze the stem + this fraction of early blocks "
                        "(train.py:863-876)")
    p.add_argument("--clip-norm", type=float, default=d.clip_norm)
    p.add_argument("--num-workers", type=int, default=8,
                   help="decode/prefetch threads in the batch loader "
                        "(train.py --num_workers analogue)")
    p.add_argument("--fit-calibrator", action="store_true",
                   help="after training, fit the isotonic calibrator on "
                        "validation predictions and save "
                        "<output-dir>/calibrator.pkl (picked up by the "
                        "detector when serving from that directory)")
    p.add_argument("--bn-momentum", type=float, default=None,
                   help="BN running-stat momentum override. Default None = "
                        "donor defaults (backbone 0.01, head 0.1), correct "
                        "when warm-starting from pretrained stats like the "
                        "reference; COLD-start training wants 0.1-0.2 or "
                        "early validation sees unconverged statistics")
    p.add_argument("--fresh", action="store_true", help="ignore resume checkpoint")
    p.add_argument("--warm-start", default=None,
                   help="best_model.pth (torch) or .npz to initialize from")
    p.add_argument("--pretrained", nargs="?", const="auto", default=None,
                   metavar="IMAGENET_PTH",
                   help="start from an ImageNet-pretrained backbone + fresh "
                        "head, exactly what the reference's model "
                        "constructor does on EVERY run including --fresh "
                        "(model.py:40-41, train.py:841). Accepts an "
                        "efficientnet_pytorch release .pth or a timm "
                        "state dict; bare flag looks for the "
                        "rtvdd-fetch-weights effnet_b0_imagenet artifact "
                        "in --output-dir then ./weights")
    p.add_argument("--output-dir", default="weights")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 forward/backward with f32 master params (the "
                        "TPU analogue of the reference's AMP; no loss "
                        "scaler needed)")
    p.add_argument("--num-devices", type=int, default=0,
                   help="devices for data-parallel training (0 = all visible)")
    args = p.parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main()
