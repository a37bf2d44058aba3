"""Depthwise-conv lowering probe (TPU): grouped lax.conv vs shifted-add VPU form.

EfficientNet's MBConv depthwise stage is the known MXU-utilization cap of
the B0 forward (docs/DESIGN.md round-3 training profile: bare fwd/bwd 66 ms
of a 163 ms bf16 step at batch 128). XLA lowers
`conv_general_dilated(feature_group_count=C)` through the MXU with one
useful lane per 128-wide tile in the worst case; the arithmetically
identical shifted-add form (sum over the K*K taps of a shifted elementwise
multiply) is pure VPU work with no MXU involvement.

This probe measures both forms on every distinct depthwise shape of B0 at
224 input (serving classify tick batch 64; training batch 128), plus the
full extract_features forward both ways, and prints one JSON dict.

Run: python tools/dw_probe.py [batch]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dw_shift(x, w, stride=1):
    """Depthwise KxK conv, TF-SAME padding, as K*K shifted multiply-adds.

    Arithmetically equal to conv2d(x, w, stride, groups=C) (sum order
    differs: taps accumulate in fixed (i,j) order instead of the MXU's
    reduction tree).
    """
    import jax.numpy as jnp
    k = w.shape[0]
    n, h, wd, c = x.shape
    oh = -(-h // stride)
    ow = -(-wd // stride)
    ph = max((oh - 1) * stride + k - h, 0)
    pw = max((ow - 1) * stride + k - wd, 0)
    xp = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)))
    acc = None
    for i in range(k):
        for j in range(k):
            t = xp[:, i:i + stride * oh:stride,
                   j:j + stride * ow:stride, :] * w[i, j, 0, :]
            acc = t if acc is None else acc + t
    return acc


def main():
    import jax
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, conv2d,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spec = EfficientNetSpec.make("b0")

    # distinct depthwise shapes (H, W, Cexp, K, stride) of B0 at 224 input
    shapes = []
    h = 224 // 2  # after stem s2
    for b in spec.blocks:
        cexp = b.cin * b.expand
        key = (h, cexp, b.kernel, b.stride)
        if key not in [s[:4] for s in shapes]:
            shapes.append((h, cexp, b.kernel, b.stride, b))
        h = -(-h // b.stride)

    rng = np.random.default_rng(0)
    results = {}

    def bench(fn, *args, iters=20, warm=3):
        f = jax.jit(fn)
        o = f(*args)
        jax.block_until_ready(o)
        for _ in range(warm):
            o = f(*args)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1000

    for (h, c, k, s, _b) in ([] if "--full-only" in sys.argv else shapes):
        x = jnp.asarray(rng.standard_normal((batch, h, h, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, 1, c)) * 0.1, jnp.float32)
        t_conv = bench(lambda x, w: conv2d(x, w, stride=s, groups=c), x, w)
        t_shift = bench(lambda x, w: dw_shift(x, w, stride=s), x, w)
        # numeric check (order-of-accumulation tolerance)
        a = conv2d(x, w, stride=s, groups=c)
        bsh = dw_shift(x, w, stride=s)
        err = float(jnp.max(jnp.abs(a - bsh)) / (jnp.max(jnp.abs(a)) + 1e-9))
        results[f"{h}x{h}x{c}k{k}s{s}"] = {
            "conv_ms": round(t_conv, 3), "shift_ms": round(t_shift, 3),
            "speedup": round(t_conv / max(t_shift, 1e-9), 2),
            "rel_err": float(f"{err:.1e}"),
        }
        print(json.dumps({f"{h}x{h}x{c}k{k}s{s}": results[f"{h}x{h}x{c}k{k}s{s}"]}),
              file=sys.stderr, flush=True)

    tot_conv = sum(v["conv_ms"] for v in results.values())
    tot_shift = sum(v["shift_ms"] for v in results.values())
    results["_total"] = {"conv_ms": round(tot_conv, 2),
                         "shift_ms": round(tot_shift, 2),
                         "speedup": round(tot_conv / max(tot_shift, 1e-9), 2),
                         "batch": batch}

    # ---- the decisive measurement: FULL extract_features forward, both
    # depthwise forms, one dispatch per forward (per-shape numbers above sit
    # on the dispatch floor over the dev tunnel and mostly measure it)
    import real_time_video_deepfake_detection_tpu.models.efficientnet as effmod
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        extract_features, init_params,
    )

    params = init_params(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))

    orig_conv2d = effmod.conv2d

    def conv2d_shift_dw(x, w, stride=1, groups=1):
        if groups > 1 and w.shape[0] > 1:
            return dw_shift(x, w, stride=stride)
        return orig_conv2d(x, w, stride=stride, groups=groups)

    for dtype in ("f32", "bf16"):
        xi = x.astype(jnp.bfloat16) if dtype == "bf16" else x
        pi = (jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
              if dtype == "bf16" else params)
        for form, c2d in (("conv", orig_conv2d), ("shift", conv2d_shift_dw)):
            effmod.conv2d = c2d
            t = bench(lambda p, x: extract_features(p, x, spec), pi, xi,
                      iters=30, warm=5)
            results[f"_forward_{dtype}_{form}"] = round(t, 3)
            print(json.dumps({f"_forward_{dtype}_{form}": round(t, 3)}),
                  file=sys.stderr, flush=True)
        effmod.conv2d = orig_conv2d
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
