"""Config-5 value experiment: trained clip-attention head vs the reference's
majority vote (round-4 verdict next #6).

The reference aggregates per-frame verdicts with a 10-frame majority vote
(/root/reference/deepfake_detection.py:146-196: counts frames whose fake
probability crosses 0.5, ties -> REAL). The clip-attention head
(models/temporal_head.py) was built on the premise that a LEARNED aggregate
over per-frame features beats that vote. This experiment measures the claim
head-to-head on the swap-proxy artifact task (tools/train_demo.py):

  * SAME features: one frozen BN-calibrated EfficientNet-B0 extracts pooled
    features for every frame; both contenders see only those features.
  * SAME supervision: clip-level labels. The vote's per-frame classifier is
    a focal-loss logistic probe trained on frames with INHERITED clip labels
    (exactly how the reference trains its frame classifier on FF++: every
    frame of a fake video is labeled fake, train.py:446-476). The head
    trains on the same clips with the same labels (train/clip_head.py).
  * Held-out split for both.

Two regimes:
  * uniform  — every frame of a fake clip carries the swap artifact.
    Per-frame evidence is dense; the vote should do fine and the head
    must NOT lose to it.
  * bursty   — only `burst_k` of `window` frames in a fake clip carry the
    artifact (a partially-manipulated video / intermittent face swap: the
    practically common hard case). Majority voting structurally fails
    (fake frames never reach the majority) while attention pooling can key
    on the few manipulated frames.

Run: python tools/clip_head_vs_vote.py [--n-train 48 --n-val 32 --window 8]
Prints a JSON table; the CI assertion lives in tests/test_clip_head_vs_vote.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_clip_dataset(n_clips, window, size, regime, seed, burst_k=3):
    """Returns (clips u8 (N,T,H,W,3) RGB raw, clip labels (N,)).
    Fake clips: all frames manipulated (uniform) or burst_k frames (bursty).
    Frames within a clip share a base identity + small jitter, like
    consecutive captures of one face."""
    from tools.train_demo import fake_artifacts, synth_base

    rng = np.random.default_rng(seed)
    clips, labels = [], []
    for i in range(n_clips):
        label = i % 2
        base = synth_base(rng, size)
        frames = []
        if label:
            hot = set(rng.choice(window, size=burst_k, replace=False).tolist()
                      ) if regime == "bursty" else set(range(window))
        else:
            hot = set()
        for t in range(window):
            f = np.clip(base.astype(np.int16)
                        + rng.integers(-4, 5, base.shape, np.int16),
                        0, 255).astype(np.uint8)
            if t in hot:
                f = fake_artifacts(f, rng)
            frames.append(f[..., ::-1])          # BGR -> RGB raw
        clips.append(np.stack(frames))
        labels.append(float(label))
    return np.stack(clips), np.asarray(labels, np.float32)


def _calibrated_backbone(key, spec, sample_frames):
    """Random-init B0 with BN running stats CALIBRATED on one pass of real
    data (bn_momentum=1.0 takes the batch statistics outright). Without
    this, eval-mode features of a random-init net collapse to ~0 (see the
    EMA note in train/steps.py) and nothing downstream can learn."""
    import jax
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.models import backbones
    from real_time_video_deepfake_detection_tpu.pipeline.classify import (
        preprocess_aligned,
    )

    params = backbones.init_params(key, spec)
    x = jax.vmap(lambda f: preprocess_aligned(f.astype(jnp.float32)))(
        jnp.asarray(sample_frames))
    _, stats = backbones.forward_train(params, x, spec, jax.random.PRNGKey(0),
                                       dropout=0.0, bn_momentum=1.0)
    return backbones.update_bn_stats(params, spec, stats)


def _train_frame_probe(key, feats, labels, steps=400, lr=0.05):
    """Focal-loss logistic probe on frame features (the vote's per-frame
    classifier; same objective as the reference frame trainer)."""
    import jax
    import jax.numpy as jnp
    import optax

    from real_time_video_deepfake_detection_tpu.train.losses import (
        focal_loss_with_smoothing,
    )

    d = feats.shape[-1]
    mu, sd = feats.mean(0), feats.std(0) + 1e-6
    fn = (feats - mu) / sd
    params = {"w": jax.random.normal(key, (d,)) * 0.01, "b": jnp.zeros(())}
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = fn @ p["w"] + p["b"]
            return focal_loss_with_smoothing(logits, labels)
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    for _ in range(steps):
        params, opt, loss = step(params, opt)

    def predict(f):
        return jax.nn.sigmoid(((f - mu) / sd) @ params["w"] + params["b"])

    return predict, float(loss)


def _majority_vote(frame_probs):
    """The reference's aggregation (deepfake_detection.py:146-196): count
    frames with p>0.5 as fake votes, verdict FAKE only on a strict
    majority (tie -> REAL)."""
    fake_votes = (np.asarray(frame_probs) > 0.5).sum(axis=1)
    t = frame_probs.shape[1]
    return (fake_votes > (t - fake_votes)).astype(np.float32)


def run_experiment(n_train=48, n_val=32, window=8, size=64, seed=0,
                   burst_k=3, head_epochs=60):
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:   # same persistent compile cache as tests/conftest.py — the
        # experiment's wall time is otherwise dominated by B0 compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.models import backbones
    from real_time_video_deepfake_detection_tpu.models import temporal_head as th
    from real_time_video_deepfake_detection_tpu.train.clip_head import (
        extract_clip_features, train_clip_head,
    )

    spec = backbones.make("b0")
    results = {}
    for regime in ("uniform", "bursty"):
        tr_clips, tr_y = _make_clip_dataset(n_train, window, size, regime,
                                            seed, burst_k)
        va_clips, va_y = _make_clip_dataset(n_val, window, size, regime,
                                            seed + 1, burst_k)
        bparams = _calibrated_backbone(
            jax.random.PRNGKey(seed), spec,
            tr_clips.reshape((-1,) + tr_clips.shape[2:])[:64])

        tr_f = np.asarray(extract_clip_features(bparams, spec,
                                                jnp.asarray(tr_clips)))
        va_f = np.asarray(extract_clip_features(bparams, spec,
                                                jnp.asarray(va_clips)))

        # --- contender 1: per-frame probe + reference majority vote -------
        frame_feats = jnp.asarray(tr_f.reshape(-1, tr_f.shape[-1]))
        frame_labels = jnp.asarray(np.repeat(tr_y, window))   # inherited
        predict, probe_loss = _train_frame_probe(
            jax.random.PRNGKey(seed + 2), frame_feats, frame_labels)
        va_probs = np.asarray(predict(jnp.asarray(
            va_f.reshape(-1, va_f.shape[-1])))).reshape(n_val, window)
        vote_acc = float((_majority_vote(va_probs) == va_y).mean())
        # probe quality on frames the probe can actually be graded on
        # (true per-frame labels exist only synthetically)
        mean_frame_p = {"real_clips": float(va_probs[va_y == 0].mean()),
                        "fake_clips": float(va_probs[va_y == 1].mean())}

        # --- contender 2: trained clip-attention head ----------------------
        hspec = th.TemporalHeadSpec(feature_dim=backbones.feature_dim(spec),
                                    window=window)
        head, log = train_clip_head(jax.random.PRNGKey(seed + 3),
                                    jnp.asarray(tr_f), jnp.asarray(tr_y),
                                    hspec, epochs=head_epochs)
        mask = jnp.ones(va_f.shape[:2], bool)
        head_p = np.asarray(jax.nn.sigmoid(
            th.forward(head, jnp.asarray(va_f), mask, hspec)))
        head_acc = float(((head_p > 0.5) == (va_y > 0.5)).mean())

        results[regime] = {
            "vote_acc": vote_acc, "head_acc": head_acc,
            "mean_frame_prob": mean_frame_p,
            "probe_train_loss": probe_loss,
            "head_train_tail": log[-1],
            "n_train_clips": n_train, "n_val_clips": n_val,
            "window": window,
            **({"burst_k": burst_k} if regime == "bursty" else {}),
        }
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-train", type=int, default=48)
    p.add_argument("--n-val", type=int, default=32)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--burst-k", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    res = run_experiment(args.n_train, args.n_val, args.window, args.size,
                         args.seed, args.burst_k)
    print(json.dumps(res, indent=2))
    return res


if __name__ == "__main__":
    main()
