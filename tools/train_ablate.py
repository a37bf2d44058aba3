"""Stage ablation for the fused training step: where do the milliseconds go?

tools/train_throughput.py measured ~2.7-4.2 ms/img (anti-scaling with
batch) against a ~0.15 ms/img B0 fwd+bwd roofline — this isolates
augment_batch, mixup_cutmix, and the bare train_step (pre-augmented f32
input) to find the sink. Chained timing as in tick_ablation.py.

Usage: python tools/train_ablate.py [steps] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from functools import partial

    from real_time_video_deepfake_detection_tpu.core.config import TrainConfig
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.train import augment
    from real_time_video_deepfake_detection_tpu.train.steps import (
        init_train_state, make_optimizer, train_step,
    )

    spec = EfficientNetSpec.make("b0")
    cfg = TrainConfig(batch_size=bs)
    rng = np.random.default_rng(0)
    imgs_u8 = jax.device_put(rng.integers(
        0, 256, (bs, cfg.image_size + 20, cfg.image_size + 20, 3),
        dtype=np.uint8))
    imgs_f32 = jax.device_put(
        rng.standard_normal((bs, cfg.image_size, cfg.image_size, 3))
        .astype(np.float32))
    labels = jax.device_put((np.arange(bs) % 2).astype(np.float32))
    zero = jax.device_put(np.float32(0.0))

    def timed(name, fn):
        def body(i, carry):
            d, acc = carry
            out = fn(d)
            nd = out.ravel()[0].astype(jnp.float32) * zero
            return nd, acc + out.ravel()[0].astype(jnp.float32)

        @jax.jit
        def run(d):
            return jax.lax.fori_loop(0, steps, body, (d, jnp.float32(0.0)))[1]

        r = run(jnp.float32(0))
        r.block_until_ready()
        t0 = time.perf_counter()
        r = run(jnp.float32(0))
        r.block_until_ready()
        ms = (time.perf_counter() - t0) / steps * 1000
        print(f"{name:34s} {ms:8.2f} ms/step ({ms / bs * 1000:6.1f} us/img)",
              flush=True)
        return ms

    key = jax.random.PRNGKey(0)

    timed("augment_batch (full aug)", lambda d: augment.augment_batch(
        key, imgs_u8 + d.astype(jnp.uint8), cfg.image_size)
        .sum(axis=(1, 2, 3)))

    timed("mixup_cutmix", lambda d: augment.mixup_cutmix(
        key, imgs_f32 + d, labels, cfg.mixup_alpha, cfg.cutmix_alpha)[0]
        .sum(axis=(1, 2, 3)))

    # bare train_step on pre-augmented input (fwd+bwd+AdamW+EMA)
    tx = make_optimizer(cfg, total_steps=1000)
    params = init_params(jax.random.PRNGKey(0), spec)
    state0 = init_train_state(params, cfg, total_steps=1000, tx=tx)
    step = jax.jit(partial(train_step, spec=spec, cfg=cfg, tx=tx))
    state, m = step(state0, imgs_f32, labels)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, imgs_f32, labels)
    jax.block_until_ready(m["loss"])
    ms = (time.perf_counter() - t0) / steps * 1000
    print(f"{'train_step (no aug) f32':34s} {ms:8.2f} ms/step "
          f"({ms / bs * 1000:6.1f} us/img)", flush=True)

    # augment sub-stages
    from real_time_video_deepfake_detection_tpu.ops.jpeg import (
        jpeg_roundtrip_bgr_tables,
    )
    ks = jax.random.split(key, bs)
    big = int(imgs_u8.shape[1])
    pad = (-big) % 16
    qlum = jnp.asarray(augment._QLUM)[7]
    qchr = jnp.asarray(augment._QCHR)[7]

    def jpeg_stage(d):
        x = imgs_u8 + d.astype(jnp.uint8)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)),
                        mode="reflect")
        out = jax.vmap(lambda im: jpeg_roundtrip_bgr_tables(
            im[..., ::-1], qlum, qchr))(x)
        return out.astype(jnp.float32).sum(axis=(1, 2, 3))
    timed("aug: jpeg roundtrip (every img)", jpeg_stage)

    def warp_stage(d):
        x = imgs_f32 + d
        Hs = jax.vmap(lambda kk: augment._sample_homography(
            kk, cfg.image_size, cfg.image_size))(ks)
        out = jax.vmap(augment._warp_bilinear)(x, Hs)
        return out.sum(axis=(1, 2, 3))
    timed("aug: homography warp", warp_stage)

    def jitter_stage(d):
        out = jax.vmap(augment._color_jitter)(ks, (imgs_f32 + d) * 0.001)
        return out.sum(axis=(1, 2, 3))
    timed("aug: color jitter", jitter_stage)

    def blur_stage(d):
        out = jax.vmap(augment._gaussian_blur3)(ks, imgs_f32 + d)
        return out.sum(axis=(1, 2, 3))
    timed("aug: gaussian blur3", blur_stage)

    def noise_stage(d):
        def one(kk):
            return jax.random.normal(
                kk, (cfg.image_size, cfg.image_size, 3)).sum()
        return jax.vmap(one)(ks) + d
    timed("aug: noise threefry gen", noise_stage)

    os._exit(0)


if __name__ == "__main__":
    main()
