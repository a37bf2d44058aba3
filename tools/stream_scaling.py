"""Detect-tick throughput vs stream count (v5e-1).

The north-star config is 64 streams x 30 fps, but the tick's cost is not
linear in the stream count (fixed per-program overhead + better MXU
occupancy at larger batch), so one chip may sustain materially more
aggregate fps at 96/128/256 slots. Chained-window methodology as bench.py.

Usage: python tools/stream_scaling.py [counts...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    counts = [int(a) for a in sys.argv[1:]] or [64, 96, 128, 192, 256]
    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        init_stream_states, make_device_step_detect,
    )
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )

    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    d = "/tmp/bench_ssd_decisive"
    proto, cm = os.path.join(d, "deploy.prototxt"), os.path.join(
        d, "res10_class.caffemodel")
    if not (os.path.exists(proto) and os.path.exists(cm)):
        proto, cm = res10_class_ssd(d, seed=0, decisive=True)
    net = SSDRes10.from_caffemodel(cm, proto).net

    rng = np.random.default_rng(0)
    for bf16 in (True, False):
        cfg = dataclasses.replace(
            DetectorConfig().with_threshold(0.55), clahe_device=True,
            bf16_inference=bf16)
        step = make_device_step_detect(net, spec, cfg)
        for n in counts:
            frames = jax.device_put(rng.integers(
                0, 256, (n, 480, 640, 3), dtype=np.uint8))
            active = jnp.ones((n,), bool)
            slot_idx = jnp.arange(n, dtype=jnp.int32)
            states = init_stream_states(n + 1, cfg)
            out, states = step(params, frames, active, slot_idx, states)
            jax.block_until_ready(out["verdict"])
            window, n_windows = 8, 6
            per_tick = []
            for w in range(n_windows + 1):
                t0 = time.perf_counter()
                for _ in range(window):
                    out, states = step(params, frames, active, slot_idx,
                                       states)
                jax.block_until_ready(out["verdict"])
                if w > 0:
                    per_tick.append((time.perf_counter() - t0) / window * 1e3)
            tick = float(np.median(per_tick))
            print(f"bf16={int(bf16)} n={n:4d} tick_p50={tick:6.2f} ms "
                  f"fps={n / tick * 1000:7.0f}", flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
