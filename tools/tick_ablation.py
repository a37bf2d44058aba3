"""Stage-level timing of the 64-stream device-detect serving tick.

Each stage runs as ONE jitted program containing a lax.fori_loop of K
iterations with a data dependency threaded through the carry (the only
trustworthy timing over the high-latency dev tunnel: one dispatch, one
sync, K on-device repetitions — per-op microbenchmarks are RTT noise,
CLAUDE.md). The dependency multiplies the previous iteration's output by a
RUNTIME zero scalar — a compile-time-opaque value, so XLA's loop-invariant
code motion cannot hoist the stage out of the loop (a literal `& 0` mask
gets constant-folded and the whole loop body hoists, reading as ~0 ms).

Usage: python tools/tick_ablation.py [K]
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

    import dataclasses

    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.models.ssd_res10 import (
        SSDRes10, detect_postprocess_batch,
    )
    from real_time_video_deepfake_detection_tpu.ops import forensics
    from real_time_video_deepfake_detection_tpu.ops.clahe import clahe_u8_batch
    from real_time_video_deepfake_detection_tpu.ops.color import (
        lab_to_rgb_u8, rgb_to_lab_u8,
    )
    from real_time_video_deepfake_detection_tpu.ops.resize import (
        crop_resize_u8_cv2, resize_bilinear_u8_cv2,
    )
    from real_time_video_deepfake_detection_tpu.pipeline.classify import (
        preprocess_aligned,
    )
    from real_time_video_deepfake_detection_tpu.models import backbones
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        init_stream_states, make_device_step_detect,
    )
    from real_time_video_deepfake_detection_tpu.state.forensic_state import (
        forensic_state_init_batch,
    )
    from real_time_video_deepfake_detection_tpu.utils.ssd_synth import (
        res10_class_ssd,
    )

    n = 64
    cap_h, cap_w = 480, 640
    spec = EfficientNetSpec.make("b0")
    cfg = dataclasses.replace(DetectorConfig().with_threshold(0.55),
                              clahe_device=True)
    params = init_params(jax.random.PRNGKey(0), spec)

    d = "/tmp/bench_ssd"
    proto, cm = os.path.join(d, "deploy.prototxt"), os.path.join(
        d, "res10_class.caffemodel")
    if not (os.path.exists(proto) and os.path.exists(cm)):
        proto, cm = res10_class_ssd(d, seed=0)
    net = SSDRes10.from_caffemodel(cm, proto).net

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 256, (n, cap_h, cap_w, 3), dtype=np.uint8))
    faces160 = jax.device_put(rng.integers(
        0, 256, (n, 160, 160, 3), dtype=np.uint8))
    frames256 = jax.device_put(rng.integers(
        0, 256, (n, 256, 256, 3), dtype=np.uint8))
    blob300 = jax.device_put(rng.standard_normal(
        (n, 3, 300, 300)).astype(np.float32) * 50)
    boxes = jax.device_put(np.stack([
        rng.integers(0, 300, n), rng.integers(0, 200, n),
        rng.integers(40, 250, n), rng.integers(40, 250, n)], axis=1)
        .astype(np.int32))
    zero = jax.device_put(np.float32(0.0))   # runtime zero, opaque to XLA

    def timed(name, fn):
        """fn(d8: u8 scalar, runtime 0) -> array. Loops K times; iteration
        i+1's input is perturbed by iteration i's output * zero."""
        def body(i, carry):
            d8, acc = carry
            out = fn(d8)
            nd8 = (out.ravel()[0].astype(jnp.float32) * zero).astype(jnp.uint8)
            return nd8, acc + out.ravel()[0].astype(jnp.float32)

        @jax.jit
        def run(d8):
            return jax.lax.fori_loop(
                0, K, body, (d8, jnp.float32(0.0)))[1]

        z8 = jnp.uint8(0)
        r = run(z8)     # compile + warm
        r.block_until_ready()
        t0 = time.perf_counter()
        r = run(z8)
        r.block_until_ready()
        ms = (time.perf_counter() - t0) / K * 1000
        print(f"{name:34s} {ms:7.2f} ms/iter", flush=True)
        return ms

    # -- stages -------------------------------------------------------------
    timed("resize 300+256 (both)", lambda d8: (
        jax.vmap(lambda x: resize_bilinear_u8_cv2(x, 300, 300))(frames + d8)
        .astype(jnp.int32).sum(axis=(1, 2, 3))
        + jax.vmap(lambda x: resize_bilinear_u8_cv2(x, 256, 256))(frames + d8)
        .astype(jnp.int32).sum(axis=(1, 2, 3))).astype(jnp.float32))

    timed("resize256 only", lambda d8: jax.vmap(
        lambda x: resize_bilinear_u8_cv2(x, 256, 256))(frames + d8)
        .astype(jnp.float32).sum(axis=(1, 2, 3)))

    def ssd_only(d8):
        det = net._forward(blob300 + d8.astype(jnp.float32))["detection_out"]
        dd = detect_postprocess_batch(det.astype(jnp.float32), cap_h, cap_w,
                                      cfg.ssd_confidence_threshold,
                                      cfg.min_face_px)
        return dd["box_xywh"].astype(jnp.float32)
    timed("SSD fwd+postproc (from blob)", ssd_only)

    def ssd_stage(d8):
        r300 = jax.vmap(
            lambda x: resize_bilinear_u8_cv2(x, 300, 300))(frames + d8)
        blob = r300.astype(jnp.float32) - jnp.asarray(
            [104.0, 177.0, 123.0], jnp.float32)
        det = net._forward(jnp.transpose(blob, (0, 3, 1, 2)))["detection_out"]
        dd = detect_postprocess_batch(det.astype(jnp.float32), cap_h, cap_w,
                                      cfg.ssd_confidence_threshold,
                                      cfg.min_face_px)
        return dd["box_xywh"].astype(jnp.float32)
    timed("resize300+SSD fwd+postproc", ssd_stage)

    timed("crop+align 160 (dyn boxes)", lambda d8: jax.vmap(
        lambda fr, b: crop_resize_u8_cv2(fr[:, :, ::-1], b, 160, 160)
    )(frames + d8, boxes).astype(jnp.float32).sum(axis=(1, 2, 3)))

    def clahe_stage(d8):
        lab = rgb_to_lab_u8((faces160 + d8).astype(jnp.float32))
        L = clahe_u8_batch(lab[..., 0])
        rgb = lab_to_rgb_u8(jnp.stack(
            [L, lab[..., 1], lab[..., 2]], axis=-1))
        return rgb.astype(jnp.float32).sum(axis=(1, 2, 3))
    timed("CLAHE(LAB roundtrip) 64x160^2", clahe_stage)

    def clahe_core(d8):
        return clahe_u8_batch(faces160[..., 0] + d8).astype(
            jnp.float32).sum(axis=(1, 2))
    timed("CLAHE core only (no LAB)", clahe_core)

    fstate = forensic_state_init_batch(n, cfg.forensic)
    full = jnp.ones((n,), bool)
    nofull = jnp.zeros((n,), bool)

    def forensic_stage(d8):
        res, _ = forensics.analyze_frame_batch(
            frames256 + d8, fstate, full, cfg.forensic)
        return res["fake_probability"]
    timed("forensics FULL 64x256^2", forensic_stage)

    def forensic_fast(d8):
        res, _ = forensics.analyze_frame_batch(
            frames256 + d8, fstate, nofull, cfg.forensic, fast_only=True)
        return res["fake_probability"]
    timed("forensics FAST-only 64x256^2", forensic_fast)

    def classify_stage(d8):
        x = jax.vmap(lambda fc: preprocess_aligned(
            fc.astype(jnp.float32), cfg.model_input_size))(faces160 + d8)
        feats = backbones.extract_features(params, x, spec)
        logits = backbones.apply_head(params, feats, spec)
        return logits
    timed("preproc224+B0 fwd f32", classify_stage)

    p16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if hasattr(v, "dtype") and v.dtype == jnp.float32 else v, params)

    def classify_bf16(d8):
        x = jax.vmap(lambda fc: preprocess_aligned(
            fc.astype(jnp.float32), cfg.model_input_size))(faces160 + d8)
        feats = backbones.extract_features(p16, x.astype(jnp.bfloat16), spec)
        logits = backbones.apply_head(p16, feats, spec)
        return logits.astype(jnp.float32)
    timed("preproc224+B0 fwd bf16", classify_bf16)

    # full tick for reference
    step = make_device_step_detect(net, spec, cfg)
    states = init_stream_states(n + 1, cfg)
    active = jnp.ones((n,), bool)
    slot_idx = jnp.arange(n, dtype=jnp.int32)
    out, states = step(params, frames, active, slot_idx, states)
    jax.block_until_ready(out["verdict"])
    t0 = time.perf_counter()
    reps = max(K // 2, 8)
    for _ in range(reps):
        out, states = step(params, frames, active, slot_idx, states)
    jax.block_until_ready(out["verdict"])
    print(f"{'FULL detect tick (chained)':34s} "
          f"{(time.perf_counter() - t0) / reps * 1000:7.2f} ms/iter",
          flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
