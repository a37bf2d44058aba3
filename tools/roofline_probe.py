"""Profile-backed roofline for the detect-inclusive serving tick (round-4
verdict next #2).

Round 4's "the tick is bandwidth-bound" rested on XLA cost analysis
(bytes_accessed counts pre-fusion logical traffic, 2-3x physical HBM). This
probe replaces the inference with a measurement: it captures a REAL
`jax.profiler` device trace of the steady-state tick on the attached TPU,
parses the xplane with xprof, and reports

  * achieved HBM bandwidth utilization (% of the hw limit) and MXU
    utilization, from the profiler's device counters;
  * the top-K ops by device self-time (who actually burns the tick);
  * device duty cycle (how much of the wall tick the chip is busy).

Usage:  python tools/roofline_probe.py [--n-streams 64] [--ticks 24]
        [--no-bf16] [--outdir /tmp/roofline_trace] [--top 12]
Run it on the TPU (do not force cpu). Emits JSON lines; the headline
numbers land in docs/DESIGN.md "Round-5" + BENCH_r05.
"""

import argparse
import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _j(obj):
    print(json.dumps(obj), flush=True)


def _gviz_rows(table):
    """gviz DataTable -> list of dicts keyed by column id."""
    ids = [c["id"] for c in table["cols"]]
    out = []
    for r in table.get("rows", []):
        out.append({i: (c or {}).get("v") for i, c in zip(ids, r["c"])})
    return out


def capture_trace(n_streams, ticks, bf16, outdir):
    import jax
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.cli.bench import _synth_ssd
    from real_time_video_deepfake_detection_tpu.core.config import (
        DetectorConfig,
    )
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        init_stream_states, make_device_step_detect,
    )

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    cap_h, cap_w = 480, 640
    spec = EfficientNetSpec.make("b0")
    cfg = dataclasses.replace(DetectorConfig().with_threshold(0.55),
                              clahe_device=True, bf16_inference=bf16)
    step = make_device_step_detect(_synth_ssd().net, spec, cfg)
    params = init_params(jax.random.PRNGKey(0), spec)
    states = init_stream_states(n_streams + 1, cfg)

    rng = np.random.default_rng(0)
    frames = [jax.device_put(rng.integers(
        0, 256, (n_streams, cap_h, cap_w, 3), dtype=np.uint8))
        for _ in range(4)]
    active = jnp.ones((n_streams,), bool)
    slot_idx = jnp.arange(n_streams, dtype=jnp.int32)

    def tick(i, states):
        return step(params, frames[i % 4], active, slot_idx, states)

    t0 = time.perf_counter()
    out, states = tick(0, states)
    jax.block_until_ready(out["verdict"])
    _j({"event": "compiled", "secs": round(time.perf_counter() - t0, 1),
        "device": str(jax.devices()[0])})
    for i in range(4):   # steady-state warmup, all frame variants staged
        out, states = tick(i, states)
    jax.block_until_ready(out["verdict"])

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for i in range(ticks):
            out, states = tick(i, states)
        jax.block_until_ready(out["verdict"])
    wall = time.perf_counter() - t0
    _j({"event": "traced", "ticks": ticks,
        "wall_ms_per_tick": round(wall / ticks * 1000, 2),
        "fps": round(n_streams * ticks / wall, 1)})
    return wall / ticks


def parse_trace(outdir, ticks, wall_tick_s, top):
    from xprof.convert import raw_to_tool_data as r2t

    xp = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                          recursive=True), key=os.path.getmtime)
    if not xp:
        _j({"event": "error", "msg": f"no xplane.pb under {outdir}"})
        return
    xp = [xp[-1]]

    # --- roofline numbers from op_profile's program root -----------------
    # (overview_page's utilization properties come back 0.0% for this
    # backend; byProgramExcludeIdle carries the measured ones: `flops` is
    # achieved-FLOP-rate / roofline, bandwidthUtils[0] is achieved HBM
    # bandwidth / hw limit, [1]/[2] are on-chip read/write utilization)
    try:
        data, _ = r2t.xspace_to_tool_data(xp, "op_profile", {})
        prof = json.loads(data)
        root = prof.get("byProgramExcludeIdle") or {}
        prog = (root.get("children") or [{}])[0]
        m = prog.get("metrics") or {}
        bw = m.get("bandwidthUtils") or [None, None, None]
        total_ps = m.get("rawTime") or 0
        _j({"event": "roofline", "program": prog.get("name"),
            "flop_rate_vs_roofline_pct": round(100 * (m.get("flops") or 0), 1),
            "hbm_bw_vs_hw_limit_pct": (
                round(100 * bw[0], 1) if bw[0] is not None else None),
            "onchip_read_pct": (
                round(100 * bw[1], 1) if bw[1] is not None else None),
            "onchip_write_pct": (
                round(100 * bw[2], 1) if bw[2] is not None else None),
            "device_ms_per_tick": round(total_ps / 1e9 / max(ticks, 1), 2)})
        cats = sorted(prog.get("children") or [],
                      key=lambda n: -((n.get("metrics") or {}).get("rawTime")
                                      or 0))
        for c in cats[:top]:
            cm = c.get("metrics") or {}
            cbw = cm.get("bandwidthUtils") or [None]
            _j({"event": "category", "name": c.get("name"),
                "us_per_tick": round((cm.get("rawTime") or 0) / 1e6
                                     / max(ticks, 1), 1),
                "pct_device": round(100 * (cm.get("rawTime") or 0)
                                    / max(total_ps, 1), 1),
                "hbm_bw_pct": (round(100 * cbw[0], 1)
                               if cbw[0] is not None else None),
                "flops_pct": round(100 * (cm.get("flops") or 0), 2)})
    except Exception as e:   # pragma: no cover
        _j({"event": "roofline_failed", "err": f"{type(e).__name__}: {e}"[:200]})

    # --- top ops by device self-time ------------------------------------
    try:
        data, _ = r2t.xspace_to_tool_data(xp, "framework_op_stats", {})
        tables = json.loads(data)
        rows, seen = [], set()
        for t in tables:
            for r in _gviz_rows(t):
                if r.get("host_or_device") != "Device":
                    continue
                key = (r.get("operation"), r.get("type"),
                       r.get("total_self_time"), r.get("occurrences"))
                if key in seen:   # the gviz payload repeats the table
                    continue
                seen.add(key)
                rows.append(r)
        rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
        dev_total_us = sum(r.get("total_self_time") or 0 for r in rows)
        rec = {"event": "device_time",
               "device_us_per_tick": round(dev_total_us / max(ticks, 1), 1)}
        if wall_tick_s > 1e-6:   # known only when we captured the trace
            rec["wall_us_per_tick"] = round(wall_tick_s * 1e6, 1)
            rec["duty_pct_vs_wall"] = round(
                100 * dev_total_us / max(ticks, 1) / (wall_tick_s * 1e6), 1)
        _j(rec)
        for r in rows[:top]:
            if r.get("type") == "IDLE":
                continue
            _j({"event": "top_op", "op": r.get("operation"),
                "type": r.get("type"),
                "self_us_per_tick": round(
                    (r.get("total_self_time") or 0) / max(ticks, 1), 1),
                "pct_device": round(
                    100 * (r.get("total_self_time") or 0)
                    / max(dev_total_us, 1e-9), 1),
                "occurrences": r.get("occurrences")})
    except Exception as e:   # pragma: no cover
        _j({"event": "op_stats_failed", "err": f"{type(e).__name__}: {e}"[:200]})



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-streams", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=24)
    ap.add_argument("--no-bf16", action="store_true")
    ap.add_argument("--outdir", default="/tmp/roofline_trace")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace dir")
    args = ap.parse_args()

    wall_tick = 0.0
    if not args.parse_only:
        wall_tick = capture_trace(args.n_streams, args.ticks,
                                  not args.no_bf16, args.outdir)
    parse_trace(args.outdir, args.ticks, wall_tick or 1e-9, args.top)


if __name__ == "__main__":
    main()
