"""Layout experiments for the device-detect tick's image stages.

Hypothesis from tools/tick_ablation.py: the interleaved (..., H, W, 3)
layout puts c=3 on the minor axis through the resize/crop matmul stages,
wasting vector lanes; a planar (..., 3, H, W) layout should lift effective
bandwidth. Also probes a hi/lo-nibble decomposition of CLAHE's 256-wide
one-hot lookup (two rank-16 one-hots instead of one rank-256: ~5x less
materialized traffic, still exact — single nonzero term per contraction).

Timing discipline as in tick_ablation.py: fori_loop chained via a runtime
zero, one dispatch + one sync per K iterations.

Usage: python tools/layout_probe.py [K]
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

    from real_time_video_deepfake_detection_tpu.ops.resize import (
        _linear_tables, _dyn_linear_tables, crop_resize_u8_cv2,
        resize_bilinear_u8_cv2,
    )
    from real_time_video_deepfake_detection_tpu.ops.clahe import clahe_u8_batch

    n = 64
    cap_h, cap_w = 480, 640
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(
        0, 256, (n, cap_h, cap_w, 3), dtype=np.uint8))
    frames_p = jax.device_put(np.ascontiguousarray(
        rng.integers(0, 256, (n, 3, cap_h, cap_w), dtype=np.uint8)))
    faces_l = jax.device_put(rng.integers(
        0, 256, (n, 160, 160), dtype=np.uint8))
    faces160 = jax.device_put(rng.integers(
        0, 256, (n, 160, 160, 3), dtype=np.uint8))
    boxes = jax.device_put(np.stack([
        rng.integers(0, 300, n), rng.integers(0, 200, n),
        rng.integers(40, 250, n), rng.integers(40, 250, n)], axis=1)
        .astype(np.int32))
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
        print(f"{name:42s} {ms:7.2f} ms/iter", flush=True)
        return ms

    mmt = jnp.bfloat16

    # ---------------- planar resize (bit-identical arithmetic) ------------
    def resize_planar(imgs_p, dst_h, dst_w):
        """(B, C, H, W) u8 -> (B, C, dst_h, dst_w) u8, cv2 arithmetic."""
        src_h, src_w = imgs_p.shape[2], imgs_p.shape[3]
        sx, sx1, ax0, ax1 = _linear_tables(src_w, dst_w)
        sy, sy1, ay0, ay1 = _linear_tables(src_h, dst_h)
        Wp = np.zeros((src_w, dst_w), np.float32)
        Wq = np.zeros((src_w, dst_w), np.float32)
        Wp[sx, np.arange(dst_w)] = 1.0
        Wq[sx1, np.arange(dst_w)] = 1.0
        xb = imgs_p.astype(mmt)
        P = jnp.einsum("bchw,wx->bchx", xb, jnp.asarray(Wp).astype(mmt),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        Q = jnp.einsum("bchw,wx->bchx", xb, jnp.asarray(Wq).astype(mmt),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        h = (jnp.asarray(ax0)[None, None, None, :] * P
             + jnp.asarray(ax1)[None, None, None, :] * Q)
        s0 = h[:, :, sy, :] >> 4
        s1 = h[:, :, sy1, :] >> 4
        b0 = jnp.asarray(ay0)[None, None, :, None]
        b1 = jnp.asarray(ay1)[None, None, :, None]
        out = (((b0 * s0) >> 16) + ((b1 * s1) >> 16) + 2) >> 2
        return jnp.clip(out, 0, 255).astype(jnp.uint8)

    timed("resize300+256 interleaved (current)", lambda d8: (
        jax.vmap(lambda x: resize_bilinear_u8_cv2(x, 300, 300))(frames + d8)
        .astype(jnp.float32).sum(axis=(1, 2, 3))
        + jax.vmap(lambda x: resize_bilinear_u8_cv2(x, 256, 256))(frames + d8)
        .astype(jnp.float32).sum(axis=(1, 2, 3))))

    timed("resize300+256 planar (pre-transposed)", lambda d8: (
        resize_planar(frames_p + d8, 300, 300)
        .astype(jnp.float32).sum(axis=(1, 2, 3))
        + resize_planar(frames_p + d8, 256, 256)
        .astype(jnp.float32).sum(axis=(1, 2, 3))))

    timed("resize300+256 planar incl. transpose", lambda d8: (
        lambda fp: resize_planar(fp, 300, 300)
        .astype(jnp.float32).sum(axis=(1, 2, 3))
        + resize_planar(fp, 256, 256)
        .astype(jnp.float32).sum(axis=(1, 2, 3)))(
            jnp.transpose(frames + d8, (0, 3, 1, 2))))

    timed("transpose to planar only", lambda d8: jnp.transpose(
        frames + d8, (0, 3, 1, 2)).astype(jnp.float32).sum(axis=(1, 2, 3)))

    # ---------------- planar crop+align ----------------------------------
    def crop_planar_one(img_p, box):
        """img_p: (3, H, W) u8, cv2 crop+resize 160, linear path only (probe:
        skip the 2x area branch to bound the win; production keeps it)."""
        H, W = img_p.shape[1], img_p.shape[2]
        x0 = box[0]
        y0 = box[1]
        w = jnp.maximum(box[2], 1)
        h = jnp.maximum(box[3], 1)
        sx, sx1, ax0, ax1 = _dyn_linear_tables(w, 160)
        sy, sy1, ay0, ay1 = _dyn_linear_tables(h, 160)
        cols = jnp.arange(W, dtype=jnp.int32)
        gx, gx1 = jnp.clip(x0 + sx, 0, W - 1), jnp.clip(x0 + sx1, 0, W - 1)
        gy, gy1 = jnp.clip(y0 + sy, 0, H - 1), jnp.clip(y0 + sy1, 0, H - 1)
        r0 = img_p[:, gy, :].astype(mmt)       # (3, 160, W)
        r1 = img_p[:, gy1, :].astype(mmt)
        Wp = (cols[None, :] == gx[:, None]).astype(mmt)
        Wq = (cols[None, :] == gx1[:, None]).astype(mmt)

        def hpass(r):
            P = jnp.einsum("chw,xw->chx", r, Wp,
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            Q = jnp.einsum("chw,xw->chx", r, Wq,
                           preferred_element_type=jnp.float32).astype(jnp.int32)
            return ax0[None, None, :] * P + ax1[None, None, :] * Q

        h0 = hpass(r0)
        h1 = hpass(r1)
        lin = ((((ay0[None, :, None] * (h0 >> 4)) >> 16)
                + ((ay1[None, :, None] * (h1 >> 4)) >> 16) + 2) >> 2)
        return jnp.clip(lin, 0, 255).astype(jnp.uint8)

    timed("crop+align interleaved (current)", lambda d8: jax.vmap(
        lambda fr, b: crop_resize_u8_cv2(fr[:, :, ::-1], b, 160, 160)
    )(frames + d8, boxes).astype(jnp.float32).sum(axis=(1, 2, 3)))

    timed("crop+align planar (linear only)", lambda d8: jax.vmap(
        lambda fp, b: crop_planar_one(fp[::-1], b)
    )(frames_p + d8, boxes).astype(jnp.float32).sum(axis=(1, 2, 3)))

    # ---------------- CLAHE nibble lookup ---------------------------------
    def clahe_nibble(imgs, clip_limit=2.0, tiles=8):
        """clahe_u8_batch with the 256-wide one-hot lookups replaced by a
        hi/lo nibble decomposition (probe: LUT build identical; only the
        histogram + lookup dataflow changes)."""
        B, H, W = imgs.shape
        th, tw = H // tiles, W // tiles
        hh, hw = th // 2, tw // 2
        px = hh * hw
        T2 = tiles * tiles
        area = th * tw
        clip = max(int(clip_limit * area / 256), 1) if clip_limit > 0 else 0

        q = imgs.reshape(B, tiles, 2, hh, tiles, 2, hw)
        q = q.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, T2, 4, px)

        hi = (q >> 4).astype(jnp.uint8)
        lo = (q & 15).astype(jnp.uint8)
        n16 = jnp.arange(16, dtype=jnp.uint8)
        oh_hi = (hi[..., None] == n16).astype(mmt)   # (B,T2,4,px,16)
        oh_lo = (lo[..., None] == n16).astype(mmt)

        # histogram as an outer-product matmul over pixels: (16h x 16l)
        hist2 = jnp.einsum("btqph,btqpl->btqhl", oh_hi, oh_lo,
                           preferred_element_type=jnp.float32)
        hist = jnp.sum(hist2, axis=2).reshape(B, T2, 256).astype(jnp.int32)

        if clip > 0:
            clipped = jnp.minimum(hist, clip)
            excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
            redist = excess // 256
            residual = excess - redist * 256
            clipped = clipped + redist
            step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
            idx = jnp.arange(256)
            bump = ((jnp.mod(idx, step) == 0) & (idx // step < residual)
                    & (residual > 0))
            hist = clipped + bump.astype(jnp.int32)
        cdf = jnp.cumsum(hist, axis=-1)
        from fractions import Fraction
        fs = Fraction(255.0 / area)
        ft = Fraction(255, area)
        nmr = cdf * 255
        qd = nmr // area
        r2 = 2 * (nmr - qd * area)
        if fs == ft:
            tie = qd + (qd % 2)
        elif fs > ft:
            tie = qd + 1
        else:
            tie = qd
        luts = jnp.where(r2 > area, qd + 1, jnp.where(r2 < area, qd, tie))
        luts = jnp.clip(luts, 0, 255).astype(jnp.float32)   # (B,T2,256)

        C = np.zeros((T2, 4, 4, T2), np.float32)
        for ty in range(tiles):
            for tx in range(tiles):
                for qd_ in range(4):
                    y0 = ty - 1 + (qd_ // 2)
                    x0 = tx - 1 + (qd_ % 2)
                    for c, (dy, dx) in enumerate(
                            ((0, 0), (0, 1), (1, 0), (1, 1))):
                        cy = min(max(y0 + dy, 0), tiles - 1)
                        cx = min(max(x0 + dx, 0), tiles - 1)
                        C[ty * tiles + tx, qd_, c, cy * tiles + cx] = 1.0
        lut_sel = jnp.einsum("bsv,tqcs->btqcv", luts.astype(mmt),
                             jnp.asarray(C, mmt))          # (B,T2,4,4,256)
        lut_hl = lut_sel.reshape(B, T2, 4, 4, 16, 16)

        # lookup via two rank-16 contractions (each a single nonzero term:
        # exact in bf16)
        t_lo = jnp.einsum("btqpl,btqchl->btqpch", oh_lo, lut_hl,
                          preferred_element_type=jnp.float32).astype(mmt)
        looked = jnp.einsum("btqph,btqpch->btqcp", oh_hi, t_lo,
                            preferred_element_type=jnp.float32)

        from real_time_video_deepfake_detection_tpu.ops.clahe import (
            _quadrant_fracs,
        )
        ya_p, xa_p = _quadrant_fracs(H, W, tiles)
        ya = jnp.asarray(ya_p)[None]
        xa = jnp.asarray(xa_p)[None]
        tl, tr = looked[:, :, :, 0], looked[:, :, :, 1]
        bl, br = looked[:, :, :, 2], looked[:, :, :, 3]
        one = jnp.float32(1.0)
        top = tl * (one - xa) + tr * xa
        bot = bl * (one - xa) + br * xa
        res = top * (one - ya) + bot * ya
        out = jnp.clip(jnp.rint(res), 0, 255).astype(jnp.uint8)
        out = out.reshape(B, tiles, tiles, 2, 2, hh, hw)
        return out.transpose(0, 1, 3, 5, 2, 4, 6).reshape(B, H, W)

    timed("CLAHE core current (rank-256 one-hot)", lambda d8: clahe_u8_batch(
        faces_l + d8).astype(jnp.float32).sum(axis=(1, 2)))
    timed("CLAHE core nibble (2x rank-16)", lambda d8: clahe_nibble(
        faces_l + d8).astype(jnp.float32).sum(axis=(1, 2)))

    # correctness spot-check of the nibble variant (on-device, tiny)
    a = clahe_u8_batch(faces_l[:4])
    b = clahe_nibble(faces_l[:4])
    print("nibble == current:", bool(jnp.all(a == b)),
          " maxdiff:", int(jnp.max(jnp.abs(
               a.astype(jnp.int32) - b.astype(jnp.int32)))), flush=True)

    # planar parity spot-check
    r_i = jax.vmap(lambda x: resize_bilinear_u8_cv2(x, 300, 300))(frames[:2])
    r_p = resize_planar(jnp.transpose(frames[:2], (0, 3, 1, 2)), 300, 300)
    print("planar resize == interleaved:", bool(jnp.all(
        jnp.transpose(r_p, (0, 2, 3, 1)) == r_i)), flush=True)

    os._exit(0)


if __name__ == "__main__":
    main()
