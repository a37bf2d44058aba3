"""MFU + throughput probe for the detect-inclusive serving tick (v5e-1).

Round-4 verdict items #2/#3: measure achieved TFLOP/s and %-of-peak behind
the fps headline (XLA cost analysis x measured tick rate), sweep slot
counts past 128, and A/B the Pallas preproc/color kernels compiled on the
real chip (plus a compiled-parity check so no kernel ships untested on
silicon).

Usage: python tools/mfu_probe.py [--quick] [--counts 64 128 ...]
Emits one JSON line per experiment; run it on the TPU (do not force cpu).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e single chip: 197 TFLOP/s bf16 / 394 TOP/s int8 (public spec).
PEAK_BF16 = 197e12


def _j(obj):
    print(json.dumps(obj), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--counts", nargs="*", type=int,
                    default=[32, 64, 96, 128, 192, 256])
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from real_time_video_deepfake_detection_tpu.cli.bench import (
        _decisive_mtcnn, _synth_ssd,
    )
    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        init_stream_states, make_device_step_detect,
    )

    dev = jax.devices()[0]
    _j({"device": str(dev), "backend": jax.default_backend()})

    cap_h, cap_w = 480, 640
    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    net = _synth_ssd().net
    base = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), clahe_device=True,
        bf16_inference=True, ssd_bf16=True)

    rng = np.random.default_rng(0)

    def measure(cfg, n_streams, label, n_windows=None, window=None):
        """Compile, extract cost analysis, time chained windows."""
        n_windows = n_windows or args.windows
        window = window or args.window
        step = make_device_step_detect(net, spec, cfg, None)
        states = init_stream_states(n_streams + 1, cfg)
        frames = [jax.device_put(rng.integers(
            0, 256, (n_streams, cap_h, cap_w, 3), dtype=np.uint8))
            for _ in range(2)]
        active = jnp.ones((n_streams,), bool)
        slot_idx = jnp.arange(n_streams, dtype=jnp.int32)

        # cost analysis of the jitted tick program
        flops = -1.0
        bytes_accessed = -1.0
        try:
            jitted = jax.jit(step)
            lowered = jitted.lower(params, frames[0], active, slot_idx,
                                   states)
            comp = lowered.compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", -1.0))
            bytes_accessed = float(ca.get("bytes accessed", -1.0))
            step_c = jitted
        except Exception as e:
            _j({"warn": f"cost_analysis failed: {type(e).__name__}: {e}"})
            step_c = step

        out, st = step_c(params, frames[0], active, slot_idx, states)
        jax.block_until_ready(out["verdict"])
        out, st = step_c(params, frames[1], active, slot_idx, st)
        jax.block_until_ready(out["verdict"])

        per_tick = []
        i = 0
        for w in range(n_windows + 1):
            t0 = time.perf_counter()
            for _ in range(window):
                out, st = step_c(params, frames[i % 2], active, slot_idx, st)
                i += 1
            jax.block_until_ready(out["verdict"])
            dt = time.perf_counter() - t0
            if w >= 1:
                per_tick.append(dt / window)
        tick_s = float(np.percentile(per_tick, 50))
        fps = n_streams / tick_s
        tflops = flops / tick_s / 1e12 if flops > 0 else -1.0
        hbm_gbs = bytes_accessed / tick_s / 1e9 if bytes_accessed > 0 else -1.0
        _j({"probe": label, "n_streams": n_streams,
            "tick_ms_p50": round(tick_s * 1000, 2),
            "fps": round(fps, 1),
            "gflop_per_tick": round(flops / 1e9, 2) if flops > 0 else -1,
            "achieved_tflops": round(tflops, 2),
            "mfu_pct_bf16peak": round(100 * tflops * 1e12 / PEAK_BF16, 2)
            if tflops > 0 else -1,
            "hbm_gb_per_s": round(hbm_gbs, 1)})
        return fps, flops

    # 1) headline MFU at 64 slots + slot sweep
    counts = args.counts[:1] if args.quick else args.counts
    results = {}
    for n in counts:
        results[n] = measure(base, n, "slots")

    # 2) Pallas A/B at 64 (and 128 if not quick)
    ab_counts = [64] if args.quick else [64, 128]
    for n in ab_counts:
        for name, cfgmod in (
                ("pallas_preproc", {"use_pallas_preproc": True}),
                ("pallas_color", {"use_pallas_color": True}),
                ("pallas_both", {"use_pallas_preproc": True,
                                 "use_pallas_color": True})):
            try:
                cfg = dataclasses.replace(base, **cfgmod)
                measure(cfg, n, name)
            except Exception as e:
                _j({"probe": name, "n_streams": n,
                    "error": f"{type(e).__name__}: {e}"[:300]})

    # 3) compiled parity on-device for each Pallas kernel vs its XLA path
    try:
        from real_time_video_deepfake_detection_tpu.kernels.preproc import (
            preprocess_faces_pallas,
        )
        from real_time_video_deepfake_detection_tpu.pipeline.classify import (
            preprocess_aligned,
        )
        faces = jnp.asarray(rng.random((8, 160, 160, 3), np.float32) * 255)
        ref = jax.vmap(preprocess_aligned)(faces)
        got = preprocess_faces_pallas(faces)          # compiled, no interpret
        d = float(jnp.max(jnp.abs(ref - got)))
        _j({"parity": "preproc_pallas_compiled", "max_abs_diff": d,
            "ok": d < 1e-4})
    except Exception as e:
        _j({"parity": "preproc_pallas_compiled",
            "error": f"{type(e).__name__}: {e}"[:300]})
    try:
        from real_time_video_deepfake_detection_tpu.kernels.color_stats import (
            color_scores_batch,
        )
        frames = jnp.asarray(rng.integers(0, 256, (4, 256, 256, 3),
                                          dtype=np.uint8))
        got = np.asarray(color_scores_batch(frames))           # compiled
        ref = np.asarray(color_scores_batch(frames, interpret=True))
        d = float(np.abs(got - ref).max())
        _j({"parity": "color_pallas_compiled", "max_abs_diff": d,
            "ok": d < 1e-6})
    except Exception as e:
        _j({"parity": "color_pallas_compiled",
            "error": f"{type(e).__name__}: {e}"[:300]})
    try:
        from real_time_video_deepfake_detection_tpu.kernels.clahe import (
            clahe_u8_pallas,
        )
        from real_time_video_deepfake_detection_tpu.ops.clahe import (
            clahe_u8_jnp,
        )
        src = jnp.asarray(rng.integers(0, 256, (256, 256), dtype=np.uint8))
        got = np.asarray(clahe_u8_pallas(src))
        ref = np.asarray(clahe_u8_jnp(src))
        d = int(np.abs(got.astype(int) - ref.astype(int)).max())
        frac = float((got != ref).mean())
        _j({"parity": "clahe_pallas_compiled", "max_abs_diff": d,
            "frac_diff": round(frac, 5), "ok": d <= 1})
    except Exception as e:
        _j({"parity": "clahe_pallas_compiled",
            "error": f"{type(e).__name__}: {e}"[:300]})

    _j({"done": True})


if __name__ == "__main__":
    main()
