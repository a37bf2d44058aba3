"""Device-side batched training augmentations.

TPU-first redesign of the reference's per-sample CPU transform stack
(train.py:442-513 + 282-309): the host only decodes JPEGs and resizes to
(image_size+20); everything else runs batched inside the jitted train step
under jax.random — random crop, hflip, color jitter, grayscale, a fused
rotation/affine/perspective homography warp, gaussian blur, normalize,
random erasing, JPEG-compression aug (using the bit-exact libjpeg round-trip
from ops/jpeg.py with per-sample quality tables), gaussian noise, and
mixup/cutmix (train.py:315-354).

Faithful quirk preserved: the reference adds gaussian noise AFTER ImageNet
normalization and clamps to [0,1] (train.py:302-309, 508-511), which crushes
normalized values for the ~30% of samples where noise fires. `noise_clamp`
keeps that behavior by default since the published accuracy was obtained
with it; set False for the sane variant.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TrainConfig
from ..ops.jpeg import jpeg_roundtrip_bgr_tables, quality_table_stack

_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

_JPEG_QLO, _JPEG_QHI = 20, 75
_QLUM, _QCHR = quality_table_stack(_JPEG_QLO, _JPEG_QHI)


def _sample_homography(rng, h, w):
    """Compose rotation(±15°) + translate(8%) + scale(0.9-1.1) +
    perspective(p=0.3, distortion 0.15) into one 3x3 matrix (output->input)."""
    ks = jax.random.split(rng, 6)
    angle = jax.random.uniform(ks[0], (), minval=-15.0, maxval=15.0) * math.pi / 180
    tx = jax.random.uniform(ks[1], (), minval=-0.08, maxval=0.08) * w
    ty = jax.random.uniform(ks[1], (), minval=-0.08, maxval=0.08) * h
    scale = jax.random.uniform(ks[2], (), minval=0.9, maxval=1.1)

    cx, cy = w / 2.0, h / 2.0
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    # inverse map: out -> in. Build forward then invert analytically for
    # rotation/scale/translation about center.
    inv_s = 1.0 / scale
    # translation applied before rotation in torchvision; inverse composition:
    A = jnp.array([[ca * inv_s, sa * inv_s], [-sa * inv_s, ca * inv_s]])
    t = jnp.array([cx, cy]) - A @ jnp.array([cx + tx, cy + ty])
    H = jnp.eye(3)
    H = H.at[:2, :2].set(A).at[:2, 2].set(A @ jnp.array([-(cx + tx), -(cy + ty)]) + jnp.array([cx, cy]))

    # perspective: displace the 4 output corners inward/outward by <=15%
    apply_p = jax.random.bernoulli(ks[3], 0.3)
    d = jax.random.uniform(ks[4], (4, 2), minval=0.0, maxval=0.15)
    src = jnp.array([[0.0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
    dst = src + d * jnp.array([[w, h], [-w, h], [-w, -h], [w, -h]])
    P = _solve_homography(src, jnp.where(apply_p, dst, src))
    return P @ H


def _solve_homography(dst_pts, src_pts):
    """3x3 H with src = H @ dst (homogeneous), from 4 correspondences."""
    def rows(d, s):
        x, y = d
        u, v = s
        return jnp.array([
            [x, y, 1, 0, 0, 0, -u * x, -u * y],
            [0, 0, 0, x, y, 1, -v * x, -v * y]]), jnp.array([u, v])

    A = jnp.concatenate([rows(dst_pts[i], src_pts[i])[0] for i in range(4)])
    b = jnp.concatenate([rows(dst_pts[i], src_pts[i])[1] for i in range(4)])
    h = jnp.linalg.solve(A, b)
    return jnp.concatenate([h, jnp.ones((1,))]).reshape(3, 3)


def _warp_bilinear_gather(img, H):
    """Direct 2D-gather bilinear warp (the textbook form) — kept as the
    numeric reference for _warp_bilinear's two-pass formulation. On TPU the
    per-pixel 2D gathers made this 2.0 ms/img (252 ms of a 407 ms train
    step at batch 128) — the minor-axis-gather pathology documented in
    docs/DESIGN.md."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-1).astype(jnp.float32) @ H.T
    u = pts[..., 0] / jnp.maximum(pts[..., 2], 1e-8)
    v = pts[..., 1] / jnp.maximum(pts[..., 2], 1e-8)
    inb = (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    u = jnp.clip(u, 0, w - 1)
    v = jnp.clip(v, 0, h - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    out = (img[v0, u0] * (1 - fu) * (1 - fv) + img[v0, u1] * fu * (1 - fv)
           + img[v1, u0] * (1 - fu) * fv + img[v1, u1] * fu * fv)
    return jnp.where(inb[..., None], out, 0.0)


def _warp_bilinear(img, H):
    """img (H,W,3) f32; H maps output coords -> input coords (homogeneous).
    Zero fill outside the source.

    TPU-native two-pass (Catmull-Smith) projective resampling: pass 1
    resamples each COLUMN u at rows V2(y,u), pass 2 resamples each ROW y at
    columns U(y,x) — each pass a 2-tap coefficient contraction (einsum on
    the MXU) instead of per-pixel 2D gathers (measured 252 -> ~8 ms for a
    128x224^2 batch). Exact pass composition: with X(y,u) the analytic
    inverse of U(y,.) and V2(y,u) = V(y, X(y,u)),
      t(y,u)   = in(V2(y,u), u)
      out(y,x) = t(y, U(y,x)) = in(V(y,x), U(y,x)).
    The separable 2-tap chain differs from direct 2D bilinear only in tap
    cross-terms (bilinear-of-bilinear); for the augmentation's mild warps
    (<=15 deg rotation, <=15% perspective) the difference is a fraction of
    a grey level (asserted vs _warp_bilinear_gather in
    tests/test_training.py), and identity maps reproduce the input exactly
    in the f32 path (the TPU path contracts in bf16: <=1 u8 LSB).
    Denominators are bounded away from zero for these warps (|H00| >= ~0.5
    after composition; guards keep FP safe regardless)."""
    h, w = img.shape[0], img.shape[1]
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, p, q = H[2, 0], H[2, 1], H[2, 2]

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]       # (h, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]       # (1, w)

    def safe_div(num, den):
        den = jnp.where(jnp.abs(den) < 1e-8,
                        jnp.where(den < 0, -1e-8, 1e-8), den)
        return num / den

    # direct map (for pass-2 columns and the zero-fill mask)
    den = g * xs + p * ys + q                            # (h, w)
    U = safe_div(a * xs + b * ys + c, den)
    V = safe_div(d * xs + e * ys + f, den)
    inb = (U >= 0) & (U <= w - 1) & (V >= 0) & (V <= h - 1)

    # pass-1 rows: X(y,u) solves U(y, X) = u, then V2 = V(y, X)
    us = xs                                              # intermediate cols
    X = safe_div(b * ys + c - us * (p * ys + q), us * g - a)
    V2 = safe_div(d * X + e * ys + f, g * X + p * ys + q)

    mmt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # vertical pass: t[y, u] = (1-fv) in[r0, u] + fv in[r1, u].
    # The (h, h, w) weight tensors are built DIRECTLY in the matmul dtype —
    # an f32 build + cast doubles the dominant HBM traffic.
    V2c = jnp.clip(V2, 0, h - 1)
    r0 = jnp.floor(V2c)
    fv = (V2c - r0).astype(mmt)
    r0 = r0.astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    rr = jnp.arange(h, dtype=jnp.int32)
    one = jnp.asarray(1.0, mmt)
    Wv = (jnp.where(rr[None, :, None] == r0[:, None, :],
                    (one - fv)[:, None, :], jnp.asarray(0.0, mmt))
          + jnp.where(rr[None, :, None] == r1[:, None, :],
                      fv[:, None, :], jnp.asarray(0.0, mmt)))
    t = jnp.einsum("yru,ruc->yuc", Wv, img.astype(mmt),
                   preferred_element_type=jnp.float32)

    # horizontal pass: out[y, x] = (1-fu) t[y, u0] + fu t[y, u1]
    Uc = jnp.clip(U, 0, w - 1)
    u0 = jnp.floor(Uc)
    fu = (Uc - u0).astype(mmt)
    u0 = u0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    uu = jnp.arange(w, dtype=jnp.int32)
    Wh = (jnp.where(uu[None, None, :] == u0[:, :, None],
                    (one - fu)[:, :, None], jnp.asarray(0.0, mmt))
          + jnp.where(uu[None, None, :] == u1[:, :, None],
                      fu[:, :, None], jnp.asarray(0.0, mmt)))
    out = jnp.einsum("yxu,yuc->yxc", Wh, t.astype(mmt),
                     preferred_element_type=jnp.float32)
    return jnp.where(inb[..., None], out, 0.0)


def _color_jitter(rng, img01):
    """brightness .3, contrast .3, saturation .25, hue .08 (fixed order;
    torchvision randomizes the order — documented simplification)."""
    ks = jax.random.split(rng, 4)
    b = jax.random.uniform(ks[0], (), minval=0.7, maxval=1.3)
    c = jax.random.uniform(ks[1], (), minval=0.7, maxval=1.3)
    s = jax.random.uniform(ks[2], (), minval=0.75, maxval=1.25)
    hshift = jax.random.uniform(ks[3], (), minval=-0.08, maxval=0.08)

    x = jnp.clip(img01 * b, 0, 1)
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    x = jnp.clip((x - gray.mean()) * c + gray.mean(), 0, 1)
    x = jnp.clip(gray[..., None] + (x - gray[..., None]) * s, 0, 1)

    # hue rotation in YIQ-ish space (cheap approximation of HSV hue shift)
    theta = hshift * 2 * math.pi
    cos_h, sin_h = jnp.cos(theta), jnp.sin(theta)
    T = jnp.array([
        [0.299 + 0.701 * cos_h + 0.168 * sin_h,
         0.587 - 0.587 * cos_h + 0.330 * sin_h,
         0.114 - 0.114 * cos_h - 0.497 * sin_h],
        [0.299 - 0.299 * cos_h - 0.328 * sin_h,
         0.587 + 0.413 * cos_h + 0.035 * sin_h,
         0.114 - 0.114 * cos_h + 0.292 * sin_h],
        [0.299 - 0.300 * cos_h + 1.250 * sin_h,
         0.587 - 0.588 * cos_h - 1.050 * sin_h,
         0.114 + 0.886 * cos_h - 0.203 * sin_h]])
    return jnp.clip(x @ T.T, 0, 1)


def _gaussian_blur3(rng, img):
    sigma = jax.random.uniform(rng, (), minval=0.1, maxval=1.5)
    xs = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    k = k / k.sum()
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    h, w = img.shape[0], img.shape[1]
    acc = sum(p[:, i:i + w] * k[i] for i in range(3))
    out = sum(acc[j:j + h] * k[j] for j in range(3))
    return out


# One named subkey per random decision in augment_one. Keys were previously
# reused across decisions (round-2 verdict: the noise gate tracked the JPEG
# quality draw; erase boxes landed on a diagonal) — a distinct key per name
# makes every draw independent; tests/test_training.py checks both the
# uniqueness of this table and the decorrelation of the resulting draws.
_AUG_KEYS = ("jpeg_q", "jpeg_gate", "crop", "flip", "jitter", "gray",
             "homography", "blur_gate", "blur_sigma", "erase_gate",
             "erase_area", "erase_aspect", "erase_y", "erase_x",
             "noise_gate", "noise_std", "noise_vals")


def _augment_keys(rng: jax.Array) -> dict:
    return dict(zip(_AUG_KEYS, jax.random.split(rng, len(_AUG_KEYS))))


def augment_one(rng: jax.Array, img_u8: jax.Array, size: int = 224,
                noise_clamp: bool = True) -> jax.Array:
    """One sample: (size+20, size+20, 3) RGB u8 -> (size, size, 3) normalized
    float32. All randomness from `rng` via the named one-key-per-decision
    table above."""
    k = _augment_keys(rng)
    big = img_u8.shape[0]

    # JPEG compression aug p=0.5, quality U{20..75} (train.py:282-296).
    # ops/jpeg needs 16-divisible dims; reflect-pad the canvas around the
    # round-trip. (BGR channel order inside the codec.)
    q = jax.random.randint(k["jpeg_q"], (), 0, _JPEG_QHI - _JPEG_QLO + 1)
    pad = (-big) % 16
    padded = jnp.pad(img_u8, ((0, pad), (0, pad), (0, 0)), mode="reflect") \
        if pad else img_u8
    jpeg = jpeg_roundtrip_bgr_tables(
        padded[..., ::-1], jnp.asarray(_QLUM)[q],
        jnp.asarray(_QCHR)[q])[..., ::-1][:big, :big]
    do_jpeg = jax.random.bernoulli(k["jpeg_gate"], 0.5)
    x = jnp.where(do_jpeg, jpeg, img_u8).astype(jnp.float32)

    # random crop to size
    off = jax.random.randint(k["crop"], (2,), 0, big - size + 1)
    x = jax.lax.dynamic_slice(x, (off[0], off[1], 0), (size, size, 3))

    # hflip p=0.5
    x = jnp.where(jax.random.bernoulli(k["flip"], 0.5), x[:, ::-1], x)

    x01 = x / 255.0
    x01 = _color_jitter(k["jitter"], x01)

    # random grayscale p=0.08
    g = (0.299 * x01[..., 0] + 0.587 * x01[..., 1] + 0.114 * x01[..., 2])[..., None]
    x01 = jnp.where(jax.random.bernoulli(k["gray"], 0.08), jnp.repeat(g, 3, -1), x01)

    # fused rotation/affine/perspective warp
    H = _sample_homography(k["homography"], size, size)
    x01 = _warp_bilinear(x01, H)

    # gaussian blur p=0.2
    x01 = jnp.where(jax.random.bernoulli(k["blur_gate"], 0.2), _gaussian_blur3(k["blur_sigma"], x01), x01)

    xn = (x01 - _MEAN) / _STD

    # random erasing p=0.25 scale .02-.2 (independent area/aspect and y/x)
    do_erase = jax.random.bernoulli(k["erase_gate"], 0.25)
    area = jax.random.uniform(k["erase_area"], (), minval=0.02, maxval=0.2) * size * size
    ar = jax.random.uniform(k["erase_aspect"], (), minval=0.3, maxval=3.3)
    eh = jnp.clip(jnp.sqrt(area * ar), 1, size - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / ar), 1, size - 1).astype(jnp.int32)
    ey = jax.random.randint(k["erase_y"], (), 0, size)
    ex = jax.random.randint(k["erase_x"], (), 1, size)
    ys, xs = jnp.mgrid[0:size, 0:size]
    emask = ((ys >= ey) & (ys < ey + eh) & (xs >= ex) & (xs < ex + ew))[..., None]
    xn = jnp.where(do_erase & emask, 0.0, xn)

    # gaussian noise p=0.3 std .01-.04, applied post-normalize with the
    # reference's clamp-to-[0,1] quirk
    do_noise = jax.random.bernoulli(k["noise_gate"], 0.3)
    std = jax.random.uniform(k["noise_std"], (), minval=0.01, maxval=0.04)
    noise = jax.random.normal(k["noise_vals"], xn.shape) * std
    noised = jnp.clip(xn + noise, 0.0, 1.0) if noise_clamp else xn + noise
    xn = jnp.where(do_noise, noised, xn)
    return xn


def augment_batch(rng: jax.Array, imgs_u8: jax.Array, size: int = 224,
                  noise_clamp: bool = True) -> jax.Array:
    ks = jax.random.split(rng, imgs_u8.shape[0])
    return jax.vmap(lambda k, im: augment_one(k, im, size, noise_clamp))(ks, imgs_u8)


def eval_preprocess_batch(imgs_u8: jax.Array) -> jax.Array:
    """Validation path: just normalize (images already resized to size)."""
    x = imgs_u8.astype(jnp.float32) / 255.0
    return (x - _MEAN) / _STD


def mixup_cutmix(rng: jax.Array, x: jax.Array, y: jax.Array,
                 mixup_alpha: float = 0.2, cutmix_alpha: float = 1.0):
    """50%-of-batches mixup-or-cutmix (train.py:563-577). Returns
    (x, y_a, y_b, lam).

    An alpha <= 0 statically disables that arm, like the reference's
    `args.mixup_alpha > 0` gates (train.py:566-570) — jax.random.beta(0, 0)
    returns NaN (numpy raises), which would silently poison every parameter
    on the first mixed batch. With both arms disabled this is the identity.
    """
    has_mix, has_cut = mixup_alpha > 0, cutmix_alpha > 0
    if not has_mix and not has_cut:
        return x, y, y, jnp.float32(1.0)
    ks = jax.random.split(rng, 7)
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    perm = jax.random.permutation(ks[0], b)

    # mixup
    lam_m = (jax.random.beta(ks[1], mixup_alpha, mixup_alpha) if has_mix
             else jnp.float32(1.0))
    lam_m = jnp.maximum(lam_m, 1 - lam_m)
    x_mix = lam_m * x + (1 - lam_m) * x[perm]

    # cutmix
    lam_c0 = (jax.random.beta(ks[2], cutmix_alpha, cutmix_alpha) if has_cut
              else jnp.float32(1.0))
    cut = jnp.sqrt(1 - lam_c0)
    ch = (h * cut).astype(jnp.int32)
    cw = (w * cut).astype(jnp.int32)
    cy = jax.random.randint(ks[3], (), 0, h + 1)
    cx = jax.random.randint(ks[6], (), 0, w + 1)
    y1 = jnp.maximum(0, cy - ch // 2)
    y2 = jnp.minimum(h, cy + ch // 2)
    x1 = jnp.maximum(0, cx - cw // 2)
    x2 = jnp.minimum(w, cx + cw // 2)
    ys, xs = jnp.mgrid[0:h, 0:w]
    inside = ((ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2))[None, :, :, None]
    x_cut = jnp.where(inside, x[perm], x)
    lam_c = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    use_mix = jax.random.bernoulli(ks[4], 0.5)
    # with one arm statically disabled, the coin always lands on the other
    use_mixup = (jax.random.bernoulli(ks[5], 0.5) if (has_mix and has_cut)
                 else jnp.asarray(has_mix))

    x_out = jnp.where(use_mix, jnp.where(use_mixup, x_mix, x_cut), x)
    lam = jnp.where(use_mix, jnp.where(use_mixup, lam_m, lam_c), 1.0)
    y_b = jnp.where(use_mix, y[perm], y)
    return x_out, y, y_b, lam
