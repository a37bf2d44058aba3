"""Training stack tests: losses, sampler, augmentation, checkpoints, fused
step, AUC (reference test strategy §4 applied to the training subsystem)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from real_time_video_deepfake_detection_tpu.core.config import TrainConfig
from real_time_video_deepfake_detection_tpu.models.efficientnet import (
    EfficientNetSpec, init_params,
)
from real_time_video_deepfake_detection_tpu.train.losses import (
    focal_loss_with_smoothing, bce_loss,
)
from real_time_video_deepfake_detection_tpu.train.augment import (
    augment_batch, mixup_cutmix, eval_preprocess_batch,
)
from real_time_video_deepfake_detection_tpu.train.data import balanced_epoch_indices
from real_time_video_deepfake_detection_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint,
)
from real_time_video_deepfake_detection_tpu.train.steps import (
    TrainState, fused_train_step, init_train_state, make_optimizer,
)
from real_time_video_deepfake_detection_tpu.train.trainer import auc_score

rng = np.random.default_rng(41)


def test_focal_loss_matches_manual():
    logits = jnp.asarray([2.0, -1.0, 0.5])
    labels = jnp.asarray([1.0, 0.0, 1.0])
    got = float(focal_loss_with_smoothing(logits, labels, 2.0, 0.25, 0.1))

    # manual numpy computation of the same formula — note the reference
    # (train.py:380-392) reassigns `targets` to the smoothed values before
    # computing bce, p_t AND alpha_t, so all three use the smoothed targets
    l = np.array([2.0, -1.0, 0.5])
    y = np.array([1.0, 0.0, 1.0])
    ys = y * 0.9 + 0.05
    p = 1 / (1 + np.exp(-l))
    bce = -(ys * np.log(p) + (1 - ys) * np.log(1 - p))
    p_t = ys * p + (1 - ys) * (1 - p)
    a_t = ys * 0.25 + (1 - ys) * 0.75
    want = float(np.mean(a_t * (1 - p_t) ** 2 * bce))
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_down_weights_easy_examples():
    easy = float(focal_loss_with_smoothing(jnp.asarray([8.0]), jnp.asarray([1.0])))
    hard = float(focal_loss_with_smoothing(jnp.asarray([-8.0]), jnp.asarray([1.0])))
    assert hard > 100 * easy


def test_balanced_sampler_two_x_minority():
    labels = np.array([0] * 10 + [1] * 50)
    idx = balanced_epoch_indices(labels, np.random.default_rng(0))
    assert len(idx) == 20
    frac_real = (labels[idx] == 0).mean()
    assert 0.25 <= frac_real <= 0.75


def test_balanced_sampler_raises_on_missing_class():
    with pytest.raises(RuntimeError):
        balanced_epoch_indices(np.zeros(10, np.int64), np.random.default_rng(0))


def test_auc_score():
    labels = np.array([0, 0, 1, 1])
    assert auc_score(labels, np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert auc_score(labels, np.array([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert auc_score(labels, np.array([0.5, 0.5, 0.5, 0.5])) == 0.5


@pytest.mark.slow
def test_augment_batch_shapes_and_range():
    imgs = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    out = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs), size=44)
    assert out.shape == (4, 44, 44, 3)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic under the same key
    out2 = augment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs), size=44)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment_batch(jax.random.PRNGKey(1), jnp.asarray(imgs), size=44)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 0.01


def test_warp_two_pass_matches_gather_reference():
    """The TPU-native two-pass warp must agree with the direct 2D-gather
    bilinear warp: exactly on identity maps (f32 path), and within a
    fraction of a grey level on the augmentation's mild projective warps
    (bilinear-of-bilinear vs direct bilinear tap cross-terms)."""
    from real_time_video_deepfake_detection_tpu.train.augment import (
        _sample_homography, _warp_bilinear, _warp_bilinear_gather,
    )

    noise = jnp.asarray(
        rng.integers(0, 256, (64, 64, 3)).astype(np.float32) / 255.0)
    ys, xs = np.mgrid[0:64, 0:64]
    smooth = jnp.asarray(np.stack(
        [np.sin(xs / 9.0) * 0.5 + 0.5, np.cos(ys / 7.0) * 0.5 + 0.5,
         (xs + ys) / 126.0], -1).astype(np.float32))
    ident = jnp.eye(3)
    np.testing.assert_array_equal(
        np.asarray(_warp_bilinear(noise, ident)), np.asarray(noise))

    for seed in range(4):
        H = _sample_homography(jax.random.PRNGKey(seed), 64, 64)
        for img, max_tol, mean_tol in (
                # the cross-term difference scales with local pixel
                # variance: tight on smooth content (faces), loose on
                # white noise (adversarial worst case)
                # noise bounds are generous: per-pixel cross-terms on white
                # noise are O(local variance) and carry no geometry signal —
                # the footprint equality + smooth-content bound do
                (smooth, 1.0 / 255.0, 0.01 / 255.0),
                (noise, 50.0 / 255.0, 5.0 / 255.0)):
            got = np.asarray(_warp_bilinear(img, H))
            want = np.asarray(_warp_bilinear_gather(img, H))
            # same zero-fill footprint
            np.testing.assert_array_equal(got == 0.0, want == 0.0)
            assert np.abs(got - want).max() < max_tol, seed
            assert np.abs(got - want).mean() < mean_tol, seed


def test_augment_rng_keys_unique_and_draws_decorrelated():
    """Round-2 verdict: augment_one reused PRNG keys, correlating the noise
    gate with the JPEG quality draw and erase y with erase x. Guard both the
    key table itself and the statistics of the draws it produces."""
    from real_time_video_deepfake_detection_tpu.train.augment import (
        _augment_keys,
    )

    # 1. every named decision gets a distinct subkey
    keys = _augment_keys(jax.random.PRNGKey(0))
    raw = {name: tuple(np.asarray(jax.random.key_data(k)).ravel())
           for name, k in keys.items()}
    assert len(set(raw.values())) == len(raw)

    # 2. draws from pairs that were formerly correlated are now independent
    n = 1000
    base = jax.random.split(jax.random.PRNGKey(7), n)
    cols = {"jpeg_q": [], "noise_gate": [], "erase_y": [], "erase_x": [],
            "erase_area": [], "erase_aspect": []}
    draw = jax.jit(lambda r: (lambda k: jnp.stack([
        jax.random.randint(k["jpeg_q"], (), 0, 56).astype(jnp.float32),
        jax.random.bernoulli(k["noise_gate"], 0.3).astype(jnp.float32),
        jax.random.randint(k["erase_y"], (), 0, 224).astype(jnp.float32),
        jax.random.randint(k["erase_x"], (), 1, 224).astype(jnp.float32),
        jax.random.uniform(k["erase_area"], (), minval=0.02, maxval=0.2),
        jax.random.uniform(k["erase_aspect"], (), minval=0.3, maxval=3.3),
    ]))(_augment_keys(r)))
    mat = np.asarray(jax.vmap(draw)(base))
    names = list(cols)
    for a, b in [("erase_y", "erase_x"), ("erase_area", "erase_aspect"),
                 ("jpeg_q", "noise_gate")]:
        r = np.corrcoef(mat[:, names.index(a)], mat[:, names.index(b)])[0, 1]
        assert abs(r) < 0.1, f"{a} vs {b} correlated: r={r:.3f}"


def test_eval_preprocess_is_plain_normalize():
    imgs = rng.integers(0, 256, (2, 44, 44, 3), dtype=np.uint8)
    out = np.asarray(eval_preprocess_batch(jnp.asarray(imgs)))
    want = (imgs / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_mixup_cutmix_contract():
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray((np.arange(8) % 2).astype(np.float32))
    for seed in range(6):
        xo, ya, yb, lam = mixup_cutmix(jax.random.PRNGKey(seed), x, y)
        assert xo.shape == x.shape
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(y))
        l = float(lam)
        assert 0.0 <= l <= 1.0


def test_mixup_cutmix_zero_alpha_disables_arm():
    """alpha <= 0 statically disables that arm like the reference's
    `args.mixup_alpha > 0` gates (train.py:566-570). Regression: round 4
    found jax.random.beta(0, 0) = NaN silently poisoning every parameter
    on the first mixed batch of a `--mixup-alpha 0` run."""
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray((np.arange(8) % 2).astype(np.float32))

    # both disabled -> exact identity
    xo, ya, yb, lam = mixup_cutmix(jax.random.PRNGKey(0), x, y, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(xo), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(yb), np.asarray(y))
    assert float(lam) == 1.0

    # one arm disabled -> everything stays finite over many draws
    for m_a, c_a in ((0.0, 1.0), (0.2, 0.0)):
        for seed in range(8):
            xo, ya, yb, lam = mixup_cutmix(
                jax.random.PRNGKey(seed), x, y, m_a, c_a)
            assert np.isfinite(np.asarray(xo)).all(), (m_a, c_a, seed)
            assert np.isfinite(float(lam)), (m_a, c_a, seed)


def test_checkpoint_roundtrip_with_rng(tmp_path):
    import random as py_random
    state = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    py_random.seed(123)
    np.random.seed(77)
    key = jax.random.PRNGKey(9)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, {"epoch": 3, "best": {"f1": 0.5}}, key)

    expected_py = py_random.random()
    expected_np = np.random.random()

    py_random.seed(0)
    np.random.seed(0)
    loaded, meta, key2 = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.arange(5.0))
    assert meta == {"epoch": 3, "best": {"f1": 0.5}}
    np.testing.assert_array_equal(np.asarray(key2), np.asarray(key))
    # host RNG restored to the post-save point
    assert py_random.random() == expected_py
    assert np.random.random() == expected_np


def test_checkpoint_meta_never_unpickles_arbitrary_globals(tmp_path):
    """Checkpoints flow back in through operator-supplied paths (--resume,
    serving --weights *.npz), so the metadata blob must load through the
    restricted unpickler: a payload referencing anything outside the
    closed save_checkpoint set (here: os.system) is refused, while a real
    TrainState resume checkpoint — PyTreeDef + optax states + TrainConfig
    snapshot + RNG capture — still round-trips."""
    import pickle

    from real_time_video_deepfake_detection_tpu.train.steps import (
        TrainState, init_train_state, make_optimizer,
    )

    # full-fidelity roundtrip: the real resume-checkpoint tree
    cfg = TrainConfig(image_size=44, batch_size=8, lr=1e-3)
    params = {"w": jnp.ones((2, 2))}
    state = init_train_state(params, cfg, total_steps=4)
    np.random.seed(3)   # legacy RNG state embeds an ndarray in the pickle
    path = str(tmp_path / "resume.npz")
    save_checkpoint(path, state, {"epoch": 1, "config": cfg},
                    jax.random.PRNGKey(1))
    loaded, meta, _ = load_checkpoint(path, restore_host_rng=True)
    assert isinstance(loaded, TrainState)
    assert meta["config"] == cfg

    # hostile file: __meta__ that REDUCEs os.system must raise, not execute
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    evil = str(tmp_path / "evil.npz")
    blob = pickle.dumps({"n_leaves": 0, "treedef": b"", "metadata": Evil()})
    np.savez(evil, __meta__=np.frombuffer(blob, np.uint8))
    with pytest.raises(pickle.UnpicklingError, match="closed set"):
        load_checkpoint(evil)


@pytest.mark.slow
def test_fused_train_step_learns_something():
    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(image_size=44, batch_size=8, lr=1e-3)
    params = init_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(cfg, total_steps=4)
    state = init_train_state(params, cfg, total_steps=4)
    imgs = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.float32))
    from functools import partial
    step = jax.jit(partial(fused_train_step, spec=spec, cfg=cfg, tx=tx))
    state2, m = step(state, imgs, labels)
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1
    # params actually moved (weights only: BN mean/var are buffers that move
    # identically in params and ema — reference EMA keeps them live)
    def wmax(a, b):
        d = jax.tree_util.tree_map_with_path(
            lambda path, x, y: 0.0 if any(
                getattr(p, "key", None) in ("mean", "var") for p in path)
            else float(jnp.abs(x - y).max()), a, b)
        return max(jax.tree.leaves(d))

    d = wmax(state.params["fc"], state2.params["fc"])
    assert d > 0
    # EMA weights moved but much less
    de = wmax(state.ema_params["fc"], state2.ema_params["fc"])
    assert 0 < de < d


@pytest.mark.slow
def test_nonfinite_grads_skip_the_step_like_gradscaler():
    """Skip-step parity with the reference's AMP GradScaler
    (train.py:591-601): a batch whose gradients overflow must NOT poison the
    params — scaler.step() drops such updates. A constant (all-zero) batch
    triggers this deterministically: BN batch variance is exactly 0, so the
    backward amplifies by rsqrt(eps) per BN layer until f32 overflows."""
    from functools import partial

    from real_time_video_deepfake_detection_tpu.train.steps import train_step

    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(batch_size=8, lr=1e-3)
    params = init_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(cfg, total_steps=8)
    state = init_train_state(params, cfg, total_steps=8, tx=tx)
    step = jax.jit(partial(train_step, spec=spec, cfg=cfg, tx=tx))

    zeros = jnp.zeros((8, 64, 64, 3), jnp.float32)
    labels = jnp.asarray((np.arange(8) % 2).astype(np.float32))
    state1, m1 = step(state, zeros, labels)
    assert not np.isfinite(float(m1["grad_norm"]))  # the batch IS degenerate

    def weights_only_delta(a, b):
        d = jax.tree_util.tree_map_with_path(
            lambda path, x, y: 0.0 if any(
                getattr(p, "key", None) in ("mean", "var") for p in path)
            else float(jnp.abs(x - y).max()), a, b)
        return max(jax.tree.leaves(d))

    # every weight untouched and finite (BN buffers still update — the
    # reference's BN running stats also update in forward even on skipped
    # scaler steps)
    assert weights_only_delta(params, state1.params) == 0.0
    assert all(bool(jnp.isfinite(v).all())
               for v in jax.tree.leaves(state1.params))

    # and the very next healthy batch trains normally
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
    state2, m2 = step(state1, imgs, labels)
    assert np.isfinite(float(m2["loss"])) and np.isfinite(float(m2["grad_norm"]))
    assert weights_only_delta(state1.params, state2.params) > 0.0


@pytest.mark.slow
def test_backbone_freezing():
    """Stem + first 60% of blocks must receive NO updates
    (reference train.py:863-876)."""
    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(image_size=44, lr=1e-2, freeze_frac=0.6)
    params = init_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(cfg, total_steps=4, n_blocks=len(spec.blocks))
    state = init_train_state(params, cfg, total_steps=4)
    imgs = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8))
    labels = jnp.asarray(np.array([0, 1, 0, 1], np.float32))
    from functools import partial
    step = jax.jit(partial(fused_train_step, spec=spec, cfg=cfg, tx=tx))
    state2, _ = step(state, imgs, labels)

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b)) or [0.0])

    # stem conv weight frozen (BN stats may still update via forward)
    assert float(jnp.abs(state2.params["stem"]["conv"]
                         - params["stem"]["conv"]).max()) == 0.0
    n_frozen = int(0.6 * len(spec.blocks))
    assert float(jnp.abs(state2.params["blocks"][0]["depthwise"]
                         - params["blocks"][0]["depthwise"]).max()) == 0.0
    assert float(jnp.abs(state2.params["blocks"][n_frozen - 1]["project"]
                         - params["blocks"][n_frozen - 1]["project"]).max()) == 0.0
    # unfrozen blocks and head DO move
    assert float(jnp.abs(state2.params["blocks"][n_frozen]["project"]
                         - params["blocks"][n_frozen]["project"]).max()) > 0.0
    assert max_delta(state2.params["fc"], params["fc"]) > 0.0


@pytest.mark.slow
def test_clip_head_learns_temporal_pattern():
    """The temporal-attention head (config 5) learns a purely TEMPORAL
    synthetic rule a per-frame majority vote cannot express: 'fake' clips
    have oscillating features, 'real' clips constant ones, with identical
    marginal frame distributions."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from real_time_video_deepfake_detection_tpu.models.temporal_head import (
        TemporalHeadSpec, forward,
    )
    from real_time_video_deepfake_detection_tpu.train.clip_head import (
        train_clip_head,
    )

    rng = np.random.default_rng(0)
    N, T, D = 128, 12, 16
    base = rng.normal(size=(N, 1, D)).astype(np.float32)
    sign = rng.integers(0, 2, size=N)          # 1 = fake (oscillates)
    osc = np.where(np.arange(T)[None, :, None] % 2 == 0, 1.0, -1.0)
    feats = base * np.where(sign[:, None, None] == 1, osc, 1.0)
    feats = (feats + rng.normal(scale=0.05, size=(N, T, D))).astype(np.float32)
    labels = sign.astype(np.float32)

    hspec = TemporalHeadSpec(feature_dim=D, dim=32, depth=1, heads=2, window=T)
    params, log = train_clip_head(jax.random.PRNGKey(0), jnp.asarray(feats),
                                  jnp.asarray(labels), hspec,
                                  epochs=40, batch_size=32, lr=3e-3)
    assert log[-1]["acc"] > 0.9, log[-1]

    # held-out clips from the same generator
    base2 = rng.normal(size=(32, 1, D)).astype(np.float32)
    sign2 = rng.integers(0, 2, size=32)
    f2 = base2 * np.where(sign2[:, None, None] == 1, osc, 1.0)
    f2 = (f2 + rng.normal(scale=0.05, size=(32, T, D))).astype(np.float32)
    mask = jnp.ones((32, T), bool)
    probs = jax.nn.sigmoid(forward(params, jnp.asarray(f2), mask, hspec))
    acc = float(np.mean((np.asarray(probs) > 0.5) == (sign2 == 1)))
    assert acc > 0.85, acc


@pytest.mark.slow
def test_bf16_train_step_close_to_f32():
    """bf16_compute (the AMP analogue) stays close to the f32 step on one
    update and keeps everything finite."""
    import dataclasses
    from functools import partial
    import jax
    import jax.numpy as jnp
    import numpy as np
    from real_time_video_deepfake_detection_tpu.core.config import TrainConfig
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.train.steps import (
        init_train_state, make_optimizer, train_step,
    )

    spec = EfficientNetSpec.make("b0")
    cfg32 = TrainConfig(batch_size=4)
    cfg16 = dataclasses.replace(cfg32, bf16_compute=True)
    params = init_params(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(cfg32, total_steps=10)
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray((rng.random(4) > 0.5), jnp.float32)

    s32 = init_train_state(params, cfg32, total_steps=10, tx=tx)
    s32, m32 = jax.jit(partial(train_step, spec=spec, cfg=cfg32, tx=tx))(
        s32, images, labels)
    s16 = init_train_state(params, cfg16, total_steps=10, tx=tx)
    s16, m16 = jax.jit(partial(train_step, spec=spec, cfg=cfg16, tx=tx))(
        s16, images, labels)

    assert np.isfinite(float(m16["loss"]))
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.05
    # master params stay f32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(s16.params)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend (multi-host/sharded states — SURVEY §5 'orbax-style
    checkpointing'): save/restore a pytree + metadata + PRNG key; restore
    onto abstract shapes works too."""
    from real_time_video_deepfake_detection_tpu.train.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax,
    )
    state = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4),
             "n": {"c": jnp.asarray(3)}}
    d = str(tmp_path / "ck")
    save_checkpoint_orbax(d, state, {"epoch": 5}, jax.random.PRNGKey(7))
    st, meta, key = load_checkpoint_orbax(d)
    assert meta == {"epoch": 5}
    assert np.array_equal(np.asarray(key), np.asarray(jax.random.PRNGKey(7)))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    st2, _, _ = load_checkpoint_orbax(d, abstract_state=abstract)
    np.testing.assert_array_equal(np.asarray(st2["w"]), np.asarray(state["w"]))


def test_trainer_cli_hyperparameter_flags_reach_config(monkeypatch):
    """Reference train.py:1090-1138 exposes every training hyperparameter as
    a CLI flag; the TPU trainer mirrors that surface. Parse a full flag set
    through the real argparse wiring and assert each lands in TrainConfig."""
    from real_time_video_deepfake_detection_tpu.train import trainer

    captured = {}

    def fake_train(args):
        captured["cfg"] = TrainConfig(
            epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
            image_size=args.image_size, seed=args.seed,
            early_stop_patience=args.patience, bf16_compute=args.bf16,
            weight_decay=args.weight_decay, head_dropout=args.dropout,
            label_smoothing=args.label_smoothing,
            mixup_alpha=args.mixup_alpha, cutmix_alpha=args.cutmix_alpha,
            focal_gamma=args.focal_gamma, focal_alpha=args.focal_alpha,
            ema_decay=args.ema_decay,
            backbone_lr_mult=args.backbone_lr_mult,
            freeze_frac=args.freeze_frac, clip_norm=args.clip_norm)
        captured["args"] = args
        return {}

    monkeypatch.setattr(trainer, "train", fake_train)
    trainer.main([
        "--dataset", "x", "--weight-decay", "0.01", "--dropout", "0.4",
        "--label-smoothing", "0.05", "--mixup-alpha", "0.7",
        "--cutmix-alpha", "0.9", "--focal-gamma", "3.0",
        "--focal-alpha", "0.5", "--ema-decay", "0.99",
        "--backbone-lr-mult", "0.2", "--freeze-frac", "0.25",
        "--clip-norm", "2.0", "--patience", "3", "--epochs", "7",
    ])
    cfg = captured["cfg"]
    assert (cfg.weight_decay, cfg.head_dropout, cfg.label_smoothing) == \
        (0.01, 0.4, 0.05)
    assert (cfg.mixup_alpha, cfg.cutmix_alpha) == (0.7, 0.9)
    assert (cfg.focal_gamma, cfg.focal_alpha, cfg.ema_decay) == (3.0, 0.5, 0.99)
    assert (cfg.backbone_lr_mult, cfg.freeze_frac, cfg.clip_norm) == \
        (0.2, 0.25, 2.0)
    assert (cfg.early_stop_patience, cfg.epochs) == (3, 7)


def test_trainer_defaults_match_reference_cli():
    """TrainConfig's defaults are the reference CLI defaults
    (train.py:1097-1123); pin them so drift is caught."""
    d = TrainConfig()
    assert (d.epochs, d.batch_size, d.lr) == (20, 32, 3e-4)
    assert (d.weight_decay, d.head_dropout) == (0.05, 0.5)
    assert (d.label_smoothing, d.mixup_alpha, d.cutmix_alpha) == (0.1, 0.3, 0.3)
    assert (d.focal_gamma, d.focal_alpha) == (2.0, 0.25)
    assert (d.ema_decay, d.early_stop_patience) == (0.999, 5)


def test_head_dropout_threads_through_training_forward():
    """cfg.head_dropout reaches the EfficientNet custom head: with the same
    RNG, dropout=0 is deterministic and differs from a high rate; ViT's
    linear head ignores it (no dropout to apply)."""
    from real_time_video_deepfake_detection_tpu.models import backbones

    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    k = jax.random.PRNGKey(3)
    l0a, _ = backbones.forward_train(params, x, spec, k, dropout=0.0)
    l0b, _ = backbones.forward_train(params, x, spec, k, dropout=0.0)
    lhi, _ = backbones.forward_train(params, x, spec, k, dropout=0.9)
    np.testing.assert_array_equal(np.asarray(l0a), np.asarray(l0b))
    assert not np.allclose(np.asarray(l0a), np.asarray(lhi))


def test_ema_keeps_bn_buffers_live():
    """Reference EMA (train.py:398-436) shadows only requires_grad
    parameters; BN running mean/var are buffers and stay LIVE during
    EMA validation. EMA-lagged stats mis-normalize every layer early in
    training (random-init eval collapses to ~0 features)."""
    from functools import partial

    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(image_size=44, batch_size=8)
    tx = make_optimizer(cfg, total_steps=4, spec=spec)
    state = init_train_state(
        init_params(jax.random.PRNGKey(0), spec), cfg, total_steps=4, tx=tx)
    step = jax.jit(partial(fused_train_step, spec=spec, cfg=cfg, tx=tx))
    imgs = jnp.asarray(rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.float32))
    state, _ = step(state, imgs, labels)

    # running stats identical between params and ema (live buffers) ...
    np.testing.assert_array_equal(
        np.asarray(state.params["stem"]["bn"]["mean"]),
        np.asarray(state.ema_params["stem"]["bn"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(state.params["fc"]["bn1"]["var"]),
        np.asarray(state.ema_params["fc"]["bn1"]["var"]))
    # ... while weights are EMA-lagged (differ after one update)
    dw = float(jnp.abs(state.params["fc"]["fc1"]["w"]
                       - state.ema_params["fc"]["fc1"]["w"]).max())
    assert dw > 0


def test_bn_momentum_head_vs_backbone():
    """Backbone BN momentum 0.01 (efficientnet_pytorch's
    batch_norm_momentum=0.99), head BatchNorm1d momentum 0.1 (torch
    default): one forward_train from zero-init stats must move head stats
    10x as far toward the batch statistics."""
    from real_time_video_deepfake_detection_tpu.models import efficientnet as E

    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    stats = []
    feats = E.extract_features(params, x, spec, train=True,
                               rng=jax.random.PRNGKey(1),
                               batch_stats_out=stats)
    # rng=None: no head dropout, so bn inputs are exactly fc1(feats)
    E.apply_head(params, feats, train=True, rng=None,
                 batch_stats_out=stats)
    new = E.update_bn_stats(params, spec, stats)

    # stem (first stats entry): new_mean = 0.99*0 + 0.01*batch_mean
    stem_in = E.conv2d(x, params["stem"]["conv"], stride=2)
    batch_mean = jnp.mean(stem_in, axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(new["stem"]["bn"]["mean"]),
                               0.01 * np.asarray(batch_mean), rtol=1e-5)

    # head bn1: new_mean = 0.9*0 + 0.1*batch_mean of fc1 pre-activations
    h = feats @ params["fc"]["fc1"]["w"] + params["fc"]["fc1"]["b"]
    head_mean = jnp.mean(h, axis=0)
    np.testing.assert_allclose(np.asarray(new["fc"]["bn1"]["mean"]),
                               0.1 * np.asarray(head_mean),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_clip_head_cli_end_to_end(tmp_path):
    """The config-5 operator path the library alone couldn't exercise:
    `python -m ...train.clip_head --videos root` samples clips from labeled
    videos (5-95% span, face-ladder crops), extracts frozen-backbone
    features, trains the temporal head, and saves a checkpoint that the
    batched engine serves via --clip-window/--clip-head."""
    import dataclasses

    import cv2

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig, ServerConfig,
    )
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine,
    )
    from real_time_video_deepfake_detection_tpu.train import clip_head

    rng_l = np.random.default_rng(3)

    def write_video(path, flicker):
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                            5, (96, 96))
        for i in range(12):
            lvl = 150 if (flicker and i % 2) else 80
            f = np.clip(rng_l.normal(lvl, 15, (96, 96, 3)),
                        0, 255).astype(np.uint8)
            w.write(f)
        w.release()

    for split, n in (("train", 3), ("val", 1)):
        for label, flick in (("real", False), ("fake", True)):
            d = tmp_path / split / label
            d.mkdir(parents=True)
            for i in range(n):
                write_video(d / f"{i}.mp4", flick)

    out = str(tmp_path / "head.npz")
    res = clip_head.main([
        "--videos", str(tmp_path), "--clip-window", "6", "--epochs", "4",
        "--batch-size", "6", "--crop-size", "48", "--out", out,
    ])
    assert res["saved"] == out and "val_acc" in res
    assert np.isfinite(res["train_log_tail"][-1]["loss"])

    from real_time_video_deepfake_detection_tpu.train.checkpoint import (
        load_checkpoint,
    )
    head, meta, _ = load_checkpoint(out, restore_host_rng=False)
    assert meta["hspec"]["window"] == 6
    cfg = dataclasses.replace(DetectorConfig(), clip_window=6)
    eng = MultiStreamEngine(cfg, ServerConfig(max_streams=2),
                            clip_head_params=head)
    frame = rng_l.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    try:
        for _ in range(2):
            r = eng.analyze(frame, "s0")
    finally:
        eng.shutdown()
    assert "clip_probability" in r


def test_load_params_any_unwraps_resume_trainstate(tmp_path):
    """--weights pointed at a RESUME checkpoint (a full TrainState) must
    serve the EMA parameters — the weights validation scored — instead of
    handing the whole TrainState to the engine (previously an opaque shape
    error deep in the first forward). Bare params pytrees load verbatim."""
    from real_time_video_deepfake_detection_tpu.train.steps import TrainState
    from real_time_video_deepfake_detection_tpu.utils.weights import (
        load_params_any,
    )

    params = {"w": jnp.arange(4.0)}
    ema = {"w": jnp.arange(4.0) * 2.0}
    state = TrainState(params=params, opt_state=(), ema_params=ema,
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    resume = str(tmp_path / "resume.npz")
    save_checkpoint(resume, state, {"epoch": 1})
    out = load_params_any(resume, spec=None)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(ema["w"]))

    best = str(tmp_path / "best.npz")
    save_checkpoint(best, ema, {"epoch": 1})
    out2 = load_params_any(best, spec=None)
    np.testing.assert_array_equal(np.asarray(out2["w"]), np.asarray(ema["w"]))
    assert load_params_any(None, spec=None) is None
