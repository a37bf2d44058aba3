"""Measure sustained training throughput of the fused train step on the
available accelerator (device-side augmentation + mixup/cutmix + forward +
focal loss + backward + AdamW + EMA, train/steps.fused_train_step — the
exact step the trainer CLI runs).

Reference point: the reference's one recorded epoch took 15,399.5 s for
~89,145 crops (~5.8 img/s, Colab GPU incl. host dataloading;
weights/training_log.json). Steps chain through TrainState so the timing is
dependency-honest over the tunnel.

Usage: python tools/train_throughput.py [steps_per_batchsize]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import dataclasses
    from functools import partial

    from real_time_video_deepfake_detection_tpu.core.config import TrainConfig
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    # import BEFORE tracing: fused_train_step lazily imports augment, whose
    # module-level jnp constants must not be created inside a jit trace
    import real_time_video_deepfake_detection_tpu.train.augment  # noqa: F401
    from real_time_video_deepfake_detection_tpu.train.steps import (
        fused_train_step, init_train_state, make_optimizer,
    )

    spec = EfficientNetSpec.make("b0")
    rng = np.random.default_rng(0)

    for bs in (64, 128, 256):
        for bf16 in (False, True):
            cfg = TrainConfig(batch_size=bs, bf16_compute=bf16)
            tx = make_optimizer(cfg, total_steps=1000)
            params = init_params(jax.random.PRNGKey(0), spec)
            state = init_train_state(params, cfg, total_steps=1000, tx=tx)
            step = jax.jit(partial(fused_train_step, spec=spec, cfg=cfg,
                                   tx=tx))
            imgs = jax.device_put(rng.integers(
                0, 256, (bs, cfg.image_size + 20, cfg.image_size + 20, 3),
                dtype=np.uint8))
            labels = jax.device_put(
                (np.arange(bs) % 2).astype(np.float32))
            state, m = step(state, imgs, labels)
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, imgs, labels)
            jax.block_until_ready(m["loss"])
            dt = time.perf_counter() - t0
            print(f"b0 batch={bs:4d} bf16={int(bf16)} "
                  f"{bs * steps / dt:8.0f} img/s "
                  f"({dt / steps * 1000:6.1f} ms/step)", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
