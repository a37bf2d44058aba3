"""A/B the full device-detect tick over scheduling-choice flags.

Isolated stage timings (tools/tick_ablation.py) mislead for a fused
program: moving VPU work onto the MXU can win alone and lose in the tick
(port balance). This measures the WHOLE make_device_step_detect program in
every combination of:
  - ops.resize.U8_MATMUL_HPASS (classifier-preproc horizontal taps)
  - ops.clahe.NIBBLE_LOOKUP    (CLAHE histogram/lookup dataflow)

Usage: python tools/tick_ab.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import dataclasses

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10,
    )
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        init_stream_states, make_device_step_detect,
    )
    from real_time_video_deepfake_detection_tpu.ops import clahe, resize

    n = 64
    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    d = "/tmp/bench_ssd"
    proto, cm = os.path.join(d, "deploy.prototxt"), os.path.join(
        d, "res10_class.caffemodel")
    if not (os.path.exists(proto) and os.path.exists(cm)):
        proto, cm = res10_class_ssd(d, seed=0)
    net = SSDRes10.from_caffemodel(cm, proto).net

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 256, (n, 480, 640, 3), dtype=np.uint8))
    active = jnp.ones((n,), bool)
    slot_idx = jnp.arange(n, dtype=jnp.int32)

    variants = []
    for u8mm in (True, False):
        for nib in (True, False):
            variants.append((u8mm, nib))

    base = dataclasses.replace(DetectorConfig().with_threshold(0.55),
                               clahe_device=True)
    for sched, cfg in (("full-f32", base),
                       ("fast-bf16", dataclasses.replace(
                           base, forensic_schedule="tick_fast",
                           bf16_inference=True))):
        for u8mm, nib in variants:
            resize.U8_MATMUL_HPASS = u8mm
            clahe.NIBBLE_LOOKUP = nib
            step = make_device_step_detect(net, spec, cfg)
            states = init_stream_states(n + 1, cfg)
            out, states = step(params, frames, active, slot_idx, states)
            jax.block_until_ready(out["verdict"])
            t0 = time.perf_counter()
            for _ in range(reps):
                out, states = step(params, frames, active, slot_idx, states)
            jax.block_until_ready(out["verdict"])
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"{sched:10s} u8_matmul={int(u8mm)} nibble={int(nib)} "
                  f"{ms:7.2f} ms/tick", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
