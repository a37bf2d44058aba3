"""Per-signal timing of the batched forensic analyzer (64x256x256).

Same fori-loop chained-window methodology as tools/tick_ablation.py: one
dispatch, K on-device iterations with a runtime-zero data dependency so XLA
cannot hoist the stage. Usage: python tools/forensic_ablation.py [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from real_time_video_deepfake_detection_tpu.ops import forensics
    from real_time_video_deepfake_detection_tpu.ops.color import (
        bgr_to_gray_u8,
    )

    n = 64
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 256, (n, 256, 256, 3), dtype=np.uint8))
    zero = jax.device_put(np.float32(0.0))

    def timed(name, fn):
        def body(i, carry):
            d8, acc = carry
            out = fn(d8)
            nd8 = (out.ravel()[0].astype(jnp.float32) * zero).astype(jnp.uint8)
            return nd8, acc + out.ravel()[0].astype(jnp.float32)

        @jax.jit
        def run(d8):
            return jax.lax.fori_loop(0, K, body, (d8, jnp.float32(0.0)))[1]

        r = run(jnp.uint8(0))
        r.block_until_ready()
        t0 = time.perf_counter()
        r = run(jnp.uint8(0))
        r.block_until_ready()
        ms = (time.perf_counter() - t0) / K * 1000
        print(f"{name:30s} {ms:7.2f} ms/iter", flush=True)
        return ms

    def gray_f(d8):
        return bgr_to_gray_u8(frames + d8).astype(jnp.float32)

    timed("bgr->gray only", lambda d8: gray_f(d8).sum(axis=(1, 2)))
    timed("frequency (fft2)", lambda d8: jax.vmap(
        forensics.frequency_score)(gray_f(d8)))
    timed("noise (blur+blockstd)", lambda d8: jax.vmap(
        forensics.noise_score)(gray_f(d8)))
    timed("ela (jpeg roundtrip)", lambda d8: jax.vmap(
        forensics.ela_score)(frames + d8))
    timed("edge (canny+laplacian)", lambda d8: jax.vmap(
        forensics.edge_score)(bgr_to_gray_u8(frames + d8)))
    timed("color (hsv stats)", lambda d8: jax.vmap(
        forensics.color_score)(frames + d8))

    os._exit(0)


if __name__ == "__main__":
    main()
