"""Jittable training/eval steps with SPMD sharding.

The reference trains single-GPU with AMP + grad accumulation + clip +
OneCycle + EMA (train.py:546-629, 891-927). Here the step is a pure function
jitted over a ("data",) mesh: batch sharded on the data axis, params
replicated; XLA inserts the gradient all-reduce over ICI. bf16 compute on
TPU replaces AMP loss scaling (bf16 has fp32-range exponent — no scaler
needed, SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import TrainConfig
from ..models import backbones
from ..models.backbones import forward, forward_train, update_bn_stats
from ..models.efficientnet import EfficientNetSpec
# top-level import: augment's module-level jnp constants must not be
# created inside a caller's jit trace (UnexpectedTracerError when its first
# import happened while tracing fused_train_step)
from .augment import augment_batch, mixup_cutmix
from .losses import focal_loss_with_smoothing


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array
    rng: jax.Array


def _is_bn_stat(path) -> bool:
    return any(getattr(p, "key", None) in ("mean", "var") for p in path)


def _ema_update(ema_params, new_params, decay):
    """Reference EMA semantics (train.py:398-436): the shadow tracks only
    `requires_grad` PARAMETERS; BN running mean/var are buffers and stay
    LIVE — apply_shadow swaps weights for evaluation but the current
    running statistics are used as-is. EMA-lagged statistics would
    mis-normalize every layer early in training (random-init EfficientNet
    eval collapses to ~0 features until the stats converge)."""
    d = decay
    ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                       ema_params, new_params)
    return jax.tree_util.tree_map_with_path(
        lambda path, e, p: p if _is_bn_stat(path) else e, ema, new_params)


def onecycle_cos_schedule(total_steps: int, peak: float,
                          pct_start: float = 0.1, div_factor: float = 25.0,
                          final_div_factor: float = 1000.0):
    """torch.optim.lr_scheduler.OneCycleLR, bit-for-bit — the reference's
    scheduler with its exact arguments (train.py:916-923: pct_start=0.1,
    anneal_strategy='cos', div_factor=25, final_div_factor=1000).

    Not optax.cosine_onecycle_schedule, for two reasons: (1) torch uses
    FLOAT phase boundaries offset by -1 (`pct_start*total_steps - 1`), so
    the two disagree at every step; (2) optax's integer interval widths
    collapse to zero when pct_start*total_steps < 1, silently yielding a
    NaN lr that poisons every trainable parameter on the first update.
    This version is finite for any total_steps >= 1 and is verified against
    torch by tests/test_torch_trajectory.py.

    `sched(i)` is the lr the torch loop uses at 0-based optimizer step i
    (OneCycleLR primes lr at construction; scheduler.step() runs AFTER each
    optimizer.step(), train.py:607-609).
    """
    initial = peak / div_factor
    min_lr = initial / final_div_factor
    e1 = pct_start * total_steps - 1.0   # end of warmup phase
    e2 = float(total_steps) - 1.0        # end of anneal phase

    def _anneal(a, b, pct):
        return b + (a - b) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def sched(count):
        c = jnp.asarray(count, jnp.float32)
        if e1 > 0:
            lr1 = _anneal(initial, peak, c / e1)
        else:
            # degenerate warmup (< 1 step): torch never enters phase 1
            lr1 = jnp.float32(peak)
        pct2 = jnp.clip((c - e1) / (e2 - e1), 0.0, 1.0) if e2 > e1 else 1.0
        lr2 = _anneal(peak, min_lr, pct2)
        return jnp.where((c <= e1) if e1 > 0 else False, lr1, lr2)

    return sched


def make_optimizer(cfg: TrainConfig, total_steps: int,
                   n_blocks: Optional[int] = None,
                   spec=None) -> optax.GradientTransformation:
    """AdamW + clip + onecycle + differential backbone LR (train.py:891-927)
    + frozen stem/early blocks (train.py:863-876: stem, _bn0 and the first
    freeze_frac of MBConv blocks get no updates). `spec` selects the
    backbone's parameter-group labeling (models/backbones.lr_group); the
    default is EfficientNet-B0.

    BN running stats are masked out of the optimizer entirely (they update
    through the forward pass).
    """
    sched = onecycle_cos_schedule(total_steps, cfg.lr)

    if spec is None:
        spec = EfficientNetSpec.make("b0")
    if n_blocks is None:
        n_blocks = backbones.n_blocks(spec)
    n_frozen = int(cfg.freeze_frac * n_blocks)

    def lr_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: backbones.lr_group(spec, path, n_frozen), params)

    tx = optax.multi_transform(
        {"head": optax.adamw(sched, weight_decay=cfg.weight_decay),
         "backbone": optax.adamw(
             lambda i: sched(i) * cfg.backbone_lr_mult,
             weight_decay=cfg.weight_decay),
         "frozen": optax.set_to_zero()},
        lr_mask)

    # Frozen params carry requires_grad=False in the reference, so their
    # grads are None and torch.nn.utils.clip_grad_norm_ (train.py:599) never
    # sees them. jax.grad always materializes the full tree — zero the
    # frozen leaves BEFORE the global-norm clip so the clip scale matches
    # torch's exactly (trajectory-verified).
    def _zero_frozen(updates, state, params=None):
        del params
        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, g: jnp.zeros_like(g)
            if backbones.lr_group(spec, path, n_frozen) == "frozen" else g,
            updates)
        return zeroed, state
    tx = optax.chain(
        optax.GradientTransformation(lambda params: optax.EmptyState(),
                                     _zero_frozen),
        optax.clip_by_global_norm(cfg.clip_norm), tx)

    def stat_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not _is_bn_stat(path), params)

    # Skip-step parity with the reference's GradScaler (train.py:591-601):
    # scaler.step() silently drops any optimizer step whose unscaled grads
    # contain inf/NaN. bf16-on-TPU needs no loss scaling, but the SKIP
    # behavior still matters — a degenerate batch (e.g. all-black frames:
    # BN batch variance is exactly 0, so the backward pass amplifies by
    # rsqrt(eps)≈316 per BN layer until f32 overflows into inf·0=NaN)
    # would otherwise poison the params permanently. The huge error budget
    # means "never accept a non-finite step", same as GradScaler.
    return optax.apply_if_finite(optax.masked(tx, stat_mask),
                                 max_consecutive_errors=10**6)


def init_train_state(params, cfg: TrainConfig, total_steps: int,
                     seed: int = 0,
                     tx: Optional[optax.GradientTransformation] = None) -> TrainState:
    if tx is None:
        tx = make_optimizer(cfg, total_steps)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        # distinct buffers: params and ema may be donated together
        ema_params=jax.tree.map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )


def _cast_bf16(tree):
    return jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, tree)


def _cast_f32(tree):
    return jax.tree.map(
        lambda v: v.astype(jnp.float32)
        if hasattr(v, "dtype") and v.dtype == jnp.bfloat16 else v, tree)


def _forward_mixed(params, x, spec, rng, bf16: bool, dropout: float = 0.5,
                   bn_momentum=None):
    """forward_train, optionally with bf16 compute (the AMP analogue:
    f32 master params cast at the jaxpr boundary — bf16 shares fp32's
    exponent range so no GradScaler is needed; grads flow back f32 through
    the cast). Logits and BN stats are returned in f32 either way."""
    if not bf16:
        return forward_train(params, x, spec, rng, dropout=dropout,
                             bn_momentum=bn_momentum)
    logits, bn_stats = forward_train(_cast_bf16(params),
                                     x.astype(jnp.bfloat16), spec, rng,
                                     dropout=dropout,
                                     bn_momentum=bn_momentum)
    return logits.astype(jnp.float32), _cast_f32(bn_stats)


def train_step(state: TrainState, images: jax.Array, labels: jax.Array,
               spec, cfg: TrainConfig,
               tx: optax.GradientTransformation):
    """One SPMD step: images (B,H,W,3) f32 normalized NHWC, labels (B,).
    Returns (new_state, metrics)."""
    rng, step_rng = jax.random.split(state.rng)

    def loss_fn(params):
        logits, bn_stats = _forward_mixed(params, images, spec, step_rng,
                                          cfg.bf16_compute, cfg.head_dropout,
                                          cfg.bn_momentum)
        loss = focal_loss_with_smoothing(
            logits[:, 0], labels, cfg.focal_gamma, cfg.focal_alpha,
            cfg.label_smoothing)
        return loss, (logits, bn_stats)

    (loss, (logits, bn_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)

    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = update_bn_stats(new_params, spec, bn_stats)

    new_ema = _ema_update(state.ema_params, new_params, cfg.ema_decay)

    preds = (jax.nn.sigmoid(logits[:, 0]) > 0.5).astype(jnp.float32)
    acc = jnp.mean(preds == labels.astype(jnp.float32))
    metrics = {"loss": loss, "accuracy": acc,
               "grad_norm": optax.global_norm(grads)}
    return TrainState(new_params, new_opt, new_ema, state.step + 1, rng), metrics


def eval_step(params, images: jax.Array, spec):
    logits = forward(params, images, spec, train=False)
    return jax.nn.sigmoid(logits[:, 0])


def fused_train_step(state: TrainState, imgs_u8: jax.Array, labels: jax.Array,
                     spec, cfg: TrainConfig,
                     tx: optax.GradientTransformation):
    """The full TPU step: device-side augmentation + mixup/cutmix + forward +
    focal loss + update. Input is the raw (B, size+20, size+20, 3) RGB u8
    batch straight from the decoder — the host does no augmentation at all.

    Grad accumulation note: the reference accumulates 2 micro-batches on GPU
    (train.py:596-605) purely to fit memory; on TPU the full effective batch
    fits, so one step == one optimizer update with the same effective batch.
    """
    rng, k_aug, k_mix, k_drop = jax.random.split(state.rng, 4)
    x = augment_batch(k_aug, imgs_u8, cfg.image_size)
    x, y_a, y_b, lam = mixup_cutmix(k_mix, x, labels,
                                    cfg.mixup_alpha, cfg.cutmix_alpha)

    def loss_fn(params):
        logits, bn_stats = _forward_mixed(params, x, spec, k_drop,
                                          cfg.bf16_compute, cfg.head_dropout,
                                          cfg.bn_momentum)
        l = logits[:, 0]
        loss_a = focal_loss_with_smoothing(
            l, y_a, cfg.focal_gamma, cfg.focal_alpha, cfg.label_smoothing)
        loss_b = focal_loss_with_smoothing(
            l, y_b, cfg.focal_gamma, cfg.focal_alpha, cfg.label_smoothing)
        return lam * loss_a + (1 - lam) * loss_b, (l, bn_stats)

    (loss, (logits, bn_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_params = update_bn_stats(new_params, spec, bn_stats)
    new_ema = _ema_update(state.ema_params, new_params, cfg.ema_decay)
    preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
    acc = jnp.mean(preds == labels.astype(jnp.float32))
    metrics = {"loss": loss, "accuracy": acc,
               "grad_norm": optax.global_norm(grads)}
    return TrainState(new_params, new_opt, new_ema, state.step + 1, rng), metrics


def make_sharded_train_step(mesh, spec, cfg: TrainConfig,
                            tx: optax.GradientTransformation,
                            step=train_step):
    """jit the step over the mesh: batch on the data axis, state replicated.
    XLA turns the batch-sharded gradient reduction into an ICI all-reduce.

    `step` is any (state, images, labels, *, spec, cfg, tx) step function —
    `train_step` (pre-normalized f32 images) or `fused_train_step` (raw u8
    batches with on-device augmentation, the trainer CLI's hot path).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    return jax.jit(
        partial(step, spec=spec, cfg=cfg, tx=tx),
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
