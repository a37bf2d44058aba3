"""Multi-stream batched serving tests (BASELINE config 4): per-stream
session isolation, batching under concurrency, schema preservation."""

import dataclasses
import io
import threading
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy engine/mesh compiles
import cv2
import jax

from real_time_video_deepfake_detection_tpu.core.config import (
    DetectorConfig, ServerConfig,
)
from real_time_video_deepfake_detection_tpu.serving.multi import (
    MultiStreamEngine, create_batched_app,
)

rng = np.random.default_rng(61)


@pytest.fixture(scope="module")
def engine():
    # heuristic backend: deterministic detection of the synthetic-ellipse
    # faces these tests draw (the haar rungs, like the reference's cascade,
    # do not fire on synthetic faces)
    cfg = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")
    scfg = ServerConfig(max_streams=8, max_batch=8, batch_timeout_ms=5.0,
                        min_request_interval=0.0)
    e = MultiStreamEngine(cfg, scfg)
    yield e
    e.shutdown()


@pytest.fixture(scope="module")
def app(engine):
    return create_batched_app(engine, engine.server_cfg)


def _frame(seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (240, 320, 3), dtype=np.uint8)


def _jpeg(frame):
    ok, enc = cv2.imencode(".jpg", frame)
    return io.BytesIO(enc.tobytes())


def test_streams_are_isolated(engine):
    engine.reset()
    for i in range(3):
        r_a = engine.analyze(_frame(i), "alice")
    r_b = engine.analyze(_frame(99), "bob")
    assert r_a["frame_count"] == 3
    assert r_b["frame_count"] == 1
    # resetting bob leaves alice intact
    engine.reset("bob")
    assert engine.frame_count("alice") == 3
    assert engine.frame_count("bob") == 0


def test_concurrent_streams_batch_together(engine):
    engine.reset()
    results = {}
    errs = []

    def worker(name):
        try:
            for i in range(5):
                results[(name, i)] = engine.analyze(_frame(hash(name) % 100 + i), name)
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(f"s{k}",)) for k in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for k in range(6):
        assert results[(f"s{k}", 4)]["frame_count"] == 5
        assert results[(f"s{k}", 4)]["success"] is True


def test_batched_matches_reference_single_stream_semantics(engine):
    """Same frame sequence through the batched engine and through the
    single-stream DeepfakeDetector server path -> identical probabilities."""
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    engine.reset()
    det = DeepfakeDetector(
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        params=engine.params, spec=engine.spec)

    for i in range(7):
        frame = _frame(i + 200)
        r_batch = engine.analyze(frame, "parity")
        forensic = det.analyze_frame_forensics(frame)
        det.frame_count += 1
        det.temporal_tracker.update(forensic["fake_probability"])
        assert r_batch["fake_probability"] == pytest.approx(
            forensic["fake_probability"], abs=1e-6), i
        assert r_batch["confidence_level"] == det.temporal_tracker.get_confidence_level()
        assert r_batch["frame_count"] == det.frame_count


def test_http_surface_with_stream_ids(app):
    app.engine.reset()
    c = app.test_client()
    f = _frame(5)
    r1 = c.post("/analyze", data={"frame": (_jpeg(f), "f.jpg"),
                                  "stream_id": "s1"})
    assert r1.status_code == 200
    j = r1.get_json()
    assert j["frame_count"] == 1
    r2 = c.post("/analyze", data={"frame": (_jpeg(f), "f.jpg"),
                                  "stream_id": "s2"})
    assert r2.get_json()["frame_count"] == 1
    r3 = c.post("/analyze", data={"frame": (_jpeg(f), "f.jpg"),
                                  "stream_id": "s1"})
    assert r3.get_json()["frame_count"] == 2
    # per-stream stats
    s = c.get("/stats")  # default stream: untouched
    assert s.get_json()["frame_count"] == 0


def test_slot_eviction_lru(engine):
    engine.reset()
    for k in range(engine.n_slots + 2):   # overflow the table
        engine.analyze(_frame(k), f"overflow{k}")
    # newest stream still works; engine didn't crash and capped slots
    assert len(engine.slot_of) == engine.n_slots


def test_face_path_batched_parity(engine):
    """Face-path parity: synthetic skin-tone face frames through the batched
    engine vs the single-stream server semantics (same params) — identical
    face probabilities and verdicts."""
    import cv2
    from real_time_video_deepfake_detection_tpu.pipeline.detector import (
        DeepfakeDetector,
    )
    engine.reset()
    det = DeepfakeDetector(
        dataclasses.replace(DetectorConfig().with_threshold(0.55),
                            face_backend="heuristic"),
        params=engine.params, spec=engine.spec)

    def face_frame(t):
        f = np.full((240, 320, 3), 120, np.uint8)
        cv2.ellipse(f, (160 + t, 120), (60, 80), 0, 0, 360, (140, 160, 210), -1)
        return f

    for t in range(5):
        frame = face_frame(t)
        r = engine.analyze(frame, "facepar")
        # single-stream server semantics (backend_server.py:147-176)
        det.analyze_frame_forensics(frame)
        faces = det.face_detector(frame)
        det.frame_count += 1
        assert len(faces) >= 1
        x, y, w, h = faces[0]
        prob, _, _ = det.analyze_face(frame[y:y + h, x:x + w])
        det.temporal_tracker.update(prob)
        assert r["analysis_mode"] == "face+frame", t
        assert r["face_probability"] == pytest.approx(prob, abs=2e-5), t
        assert r["confidence_level"] == det.temporal_tracker.get_confidence_level()
        assert r["face_bbox"] == {"x": int(x), "y": int(y),
                                  "width": int(w), "height": int(h)}


def test_clahe_device_mode_close_to_host():
    """clahe_device=True (Pallas CLAHE on the aligned crop, device side)
    tracks the host-CLAHE path: same analysis mode/bbox, face probability
    within the documented approximation tolerance (CLAHE and the align
    resize commuted)."""
    if jax.default_backend() == "cpu":
        pytest.skip("pallas clahe compiles on TPU only")
    base = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")
    scfg = ServerConfig(max_streams=2, max_batch=2, batch_timeout_ms=2.0,
                        min_request_interval=0.0)
    e_host = MultiStreamEngine(base, scfg)
    e_dev = MultiStreamEngine(
        dataclasses.replace(base, clahe_device=True), scfg,
        params=e_host.params, spec=e_host.spec)
    try:
        for t in range(3):
            f = np.full((240, 320, 3), 120, np.uint8)
            cv2.ellipse(f, (160, 120 + t), (60, 80), 0, 0, 360,
                        (140, 160, 210), -1)
            rh = e_host.analyze(f, "s")
            rd = e_dev.analyze(f, "s")
            assert rd["analysis_mode"] == rh["analysis_mode"]
            if "face_bbox" in rh:
                assert rd["face_bbox"] == rh["face_bbox"]
                assert abs(rd["face_probability"]
                           - rh["face_probability"]) < 0.05
    finally:
        e_host.shutdown()
        e_dev.shutdown()


def test_clahe_device_rejects_mtcnn_aligner():
    from real_time_video_deepfake_detection_tpu.serving.multi import (
        MultiStreamEngine as MSE,
    )

    class FakeMTCNN:
        pass
    FakeMTCNN.__name__ = "MTCNNAligner"
    cfg = dataclasses.replace(DetectorConfig(), clahe_device=True)
    with pytest.raises(ValueError):
        MSE(cfg, ServerConfig(max_streams=2, max_batch=2),
            aligner=FakeMTCNN())


def test_clip_attention_verdict_mode():
    """BASELINE config 5: clip_window>0 replaces the majority vote with the
    temporal-attention head. UNCERTAIN until clip_min_frames face frames,
    then verdict == clip_probability thresholded; /reset clears the ring."""
    cfg = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic",
        clip_window=8, clip_min_frames=3)
    e = MultiStreamEngine(cfg, ServerConfig(
        max_streams=2, max_batch=2, batch_timeout_ms=2.0,
        min_request_interval=0.0))
    try:
        def face_frame(t):
            f = np.full((240, 320, 3), 120, np.uint8)
            cv2.ellipse(f, (160, 120 + t), (60, 80), 0, 0, 360,
                        (140, 160, 210), -1)
            return f

        rs = [e.analyze(face_frame(t), "clip") for t in range(5)]
        for t, r in enumerate(rs):
            assert "clip_probability" in r, r
            assert r["clip_frames"] == t + 1
            if t + 1 < 3:
                assert r["confidence_level"] == "UNCERTAIN", (t, r)
            else:
                want = "FAKE" if r["clip_probability"] > 0.55 else "REAL"
                assert r["confidence_level"] == want, (t, r)
        # no-face frames do not advance the clip ring
        r_noface = e.analyze(_frame(3), "clip")
        assert r_noface["clip_frames"] == 5
        e.reset("clip")
        r = e.analyze(face_frame(0), "clip")
        assert r["clip_frames"] == 1
        assert r["confidence_level"] == "UNCERTAIN"
    finally:
        e.shutdown()


def test_sharded_serving_tick_matches_single_device():
    """Multi-chip serving: the tick sharded over the 8-device CPU mesh
    (streams partitioned across devices) produces identical outputs and
    state to the unsharded tick."""
    import jax.numpy as jnp
    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.parallel.mesh import make_mesh
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        device_step, init_stream_states, make_sharded_device_step,
        serving_shardings,
    )
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    N = 16
    spec = EfficientNetSpec.make("b0")
    cfg = DetectorConfig().with_threshold(0.55)
    params = init_params(jax.random.PRNGKey(0), spec)
    states = init_stream_states(N, cfg)
    r = np.random.default_rng(11)
    frames = jnp.asarray(r.integers(0, 256, (N, 256, 256, 3), dtype=np.uint8))
    faces = jnp.asarray(r.random((N, 160, 160, 3), dtype=np.float32) * 255)
    has_face = jnp.asarray(r.random(N) > 0.3)
    face_hw = jnp.full((N, 2), 100, jnp.int32)
    active = jnp.ones((N,), bool)

    out1, st1 = device_step(spec, cfg, params, frames, faces, has_face,
                            face_hw, active, states)

    mesh = make_mesh(8)
    repl, data = serving_shardings(mesh)
    step = make_sharded_device_step(mesh, spec, cfg)
    out8, st8 = step(jax.device_put(params, repl),
                     jax.device_put(frames, data),
                     jax.device_put(faces, data),
                     jax.device_put(has_face, data),
                     jax.device_put(face_hw, data),
                     jax.device_put(active, data),
                     jax.device_put(states, data))

    for k in out1:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out8[k]),
                                   atol=2e-5, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_align_box_multiple_quantizes_mtcnn_crops():
    """ServerConfig.align_box_multiple bounds the MTCNN compiled-size set by
    rounding crop sizes up to a multiple (clamped to the frame); the
    response bbox reports the actual crop."""
    sizes = []

    class MTCNNAligner:   # stub matching the engine's type-name check
        def __call__(self, crop):
            sizes.append(crop.shape[:2])
            return np.zeros((160, 160, 3), np.float32)

    cfg = dataclasses.replace(DetectorConfig().with_threshold(0.55),
                              face_backend="heuristic")
    e = MultiStreamEngine(
        cfg, ServerConfig(max_streams=2, max_batch=2, batch_timeout_ms=2.0,
                          min_request_interval=0.0, align_box_multiple=32),
        aligner=MTCNNAligner())
    try:
        f = np.full((240, 320, 3), 120, np.uint8)
        cv2.ellipse(f, (160, 120), (61, 79), 0, 0, 360, (140, 160, 210), -1)
        r = e.analyze(f, "q")
        assert r["analysis_mode"] == "face+frame"
        bb = r["face_bbox"]
        h, w = sizes[-1]
        assert h % 32 == 0 or bb["y"] + h == 240
        assert w % 32 == 0 or bb["x"] + w == 320
        assert (bb["width"], bb["height"]) == (w, h)
    finally:
        e.shutdown()


def test_forensic_tick_schedule_matches_frame_schedule_when_synchronized():
    """ServerConfig.forensic_tick_schedule: for a stream that ticks every
    tick from frame 0, the tick-level full/fast alternation is
    output-identical to the reference per-stream frame schedule."""
    base = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")
    scfg = ServerConfig(max_streams=2, max_batch=2, batch_timeout_ms=2.0,
                        min_request_interval=0.0)
    e_frame = MultiStreamEngine(base, scfg)
    e_tick = MultiStreamEngine(
        base, dataclasses.replace(scfg, forensic_tick_schedule=True),
        params=e_frame.params, spec=e_frame.spec)
    try:
        for i in range(7):
            f = _frame(i + 300)
            r1 = e_frame.analyze(f, "s")
            r2 = e_tick.analyze(f, "s")
            assert r2["fake_probability"] == pytest.approx(
                r1["fake_probability"], abs=1e-6), i
            assert r2["frame_forensic_probability"] == pytest.approx(
                r1["frame_forensic_probability"], abs=1e-6), i
            assert r2["confidence_level"] == r1["confidence_level"], i
    finally:
        e_frame.shutdown()
        e_tick.shutdown()


@pytest.mark.slow
def test_analyze_cli_multi_video_batched(tmp_path):
    """`rtvdd-analyze a.mp4 b.mp4 c.mp4` runs the videos through the batched
    engine: frames from different files share device ticks, every video gets
    its own stream verdict, and frames_total/ticks prove real batching."""
    import contextlib
    import json as _json

    from real_time_video_deepfake_detection_tpu.cli import analyze

    rng_l = np.random.default_rng(9)
    paths = []
    for v in range(3):
        p = str(tmp_path / f"v{v}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 5, (320, 240))
        for _ in range(5):
            frame = np.full((240, 320, 3), 60 + 40 * v, np.uint8)
            frame += rng_l.integers(0, 20, frame.shape, dtype=np.uint8)
            w.write(frame)
        w.release()
        paths.append(p)

    js = str(tmp_path / "out.json")
    with contextlib.redirect_stdout(io.StringIO()):
        analyze.main(paths + ["--json", js, "--max-frames", "4"])
    r = _json.load(open(js))
    assert len(r["videos"]) == 3
    for v in r["videos"]:
        assert v["frames"] == 4
        assert v["final_verdict"] in ("REAL", "FAKE", "UNCERTAIN")
    assert r["frames_total"] == 12
    # 3 synchronized readers -> frames from different files shared at least
    # one device tick. (A tick-COUNT ceiling is scheduling-dependent: on a
    # loaded 1-core CI host the reader threads can serialize almost
    # completely, so assert batching evidence, not a tick budget.)
    assert r["max_batch_seen"] >= 2
    assert r["engine_ticks"] < r["frames_total"]


def test_analyze_cli_multi_rejects_output(tmp_path):
    """--output writes ONE annotated video; with several inputs it must
    fail fast instead of silently dropping annotation."""
    from real_time_video_deepfake_detection_tpu.cli import analyze

    with pytest.raises(SystemExit):
        analyze.main(["a.mp4", "b.mp4", "--output", str(tmp_path / "o.mp4")])


def test_calibrator_knots_apply_in_tick():
    """A fitted isotonic calibrator must act identically in both serving
    modes: the batched tick applies the knot map to the FACE probability
    between sigmoid and the small-face heuristic (the reference's
    apply_calibration-then-apply_heuristics order,
    deepfake_detection.py:535-538). Verified against np.interp of the
    uncalibrated tick's probabilities."""
    import jax.numpy as jnp

    from real_time_video_deepfake_detection_tpu.models.efficientnet import (
        EfficientNetSpec, init_params,
    )
    from real_time_video_deepfake_detection_tpu.serving.batcher import (
        device_step, init_stream_states,
    )

    N = 4
    spec = EfficientNetSpec.make("b0")
    params = init_params(jax.random.PRNGKey(0), spec)
    r = np.random.default_rng(5)
    frames = jnp.asarray(r.integers(0, 256, (N, 256, 256, 3), dtype=np.uint8))
    faces = jnp.asarray(r.random((N, 160, 160, 3), dtype=np.float32) * 255)
    has_face = jnp.ones((N,), bool)
    face_hw = jnp.full((N, 2), 100, jnp.int32)   # not small: no boost
    active = jnp.ones((N,), bool)

    cfg0 = DetectorConfig().with_threshold(0.55)
    out0, _ = device_step(spec, cfg0, params, frames, faces, has_face,
                          face_hw, active, init_stream_states(N, cfg0))

    knots = ((0.0, 0.4, 0.6, 1.0), (0.1, 0.2, 0.8, 0.9))
    cfg1 = dataclasses.replace(cfg0, calibrator_knots=knots)
    out1, _ = device_step(spec, cfg1, params, frames, faces, has_face,
                          face_hw, active, init_stream_states(N, cfg1))

    want = np.interp(np.asarray(out0["face_probability"]),
                     np.asarray(knots[0]), np.asarray(knots[1]))
    np.testing.assert_allclose(np.asarray(out1["face_probability"]), want,
                               atol=1e-6)
    assert not np.allclose(np.asarray(out1["face_probability"]),
                           np.asarray(out0["face_probability"]))


def test_latency_mode_max_batch_splits_ticks_identically():
    """Latency mode (ServerConfig.max_batch < max_streams, server
    --max-batch): the batcher serves the streams as interleaved tick
    groups of at most max_batch slots. Per-stream state chains are
    independent of tick grouping (the default per-frame forensic schedule
    follows each stream's own frame count), so every per-stream output
    sequence must be IDENTICAL to the full-batch engine's — smaller ticks
    trade aggregate throughput for per-frame latency, never results."""
    cfg = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")

    def drive(max_batch):
        scfg = ServerConfig(max_streams=8, max_batch=max_batch,
                            batch_timeout_ms=5.0, min_request_interval=0.0)
        eng = MultiStreamEngine(cfg, scfg)
        assert max(eng.buckets) == max_batch
        out = {}
        errs = []

        def worker(name):
            try:
                seq = []
                for i in range(3):
                    seq.append(eng.analyze(_frame(hash(name) % 50 + i), name))
                out[name] = seq
            except Exception as e:   # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(f"s{k}",))
                   for k in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        eng.shutdown()
        assert not errs
        return out

    full = drive(max_batch=8)
    split = drive(max_batch=4)
    assert set(full) == set(split)
    for name in full:
        for a, b in zip(full[name], split[name]):
            assert a["frame_count"] == b["frame_count"]
            assert a["analysis_mode"] == b["analysis_mode"]
            for k in ("fake_probability", "frame_forensic_probability",
                      "temporal_average", "stability_score"):
                if k in a or k in b:
                    np.testing.assert_allclose(a[k], b[k], atol=1e-6,
                                               err_msg=f"{name} {k}")
            assert a["confidence_level"] == b["confidence_level"]


@pytest.mark.slow
def test_analyze_cli_single_video_npz_weights(tmp_path):
    """--weights with a trainer .npz must go through the shared loader in
    the SINGLE-video path too (review finding: it previously routed to the
    torch .pth converter and crashed before the first frame)."""
    import contextlib
    import json as _json

    import jax
    from real_time_video_deepfake_detection_tpu.cli import analyze
    from real_time_video_deepfake_detection_tpu.models import backbones
    from real_time_video_deepfake_detection_tpu.train.checkpoint import (
        save_checkpoint,
    )

    params = backbones.init_params(jax.random.PRNGKey(0), backbones.make("b0"))
    npz = str(tmp_path / "best.npz")
    save_checkpoint(npz, params, {"epoch": 1})

    rng_l = np.random.default_rng(3)
    p = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 5, (160, 120))
    for _ in range(3):
        w.write(rng_l.integers(0, 256, (120, 160, 3), dtype=np.uint8))
    w.release()

    js = str(tmp_path / "out.json")
    with contextlib.redirect_stdout(io.StringIO()):
        analyze.main([p, "--weights", npz, "--backbone", "b0",
                      "--json", js, "--max-frames", "2"])
    r = _json.load(open(js))
    assert r["summary"]["frames"] == 2
    assert r["summary"]["final_verdict"] in ("REAL", "FAKE", "UNCERTAIN")


def test_invalid_requests_never_evict_streams(app, engine):
    """slot_for can LRU-evict (and zero) a live stream's temporal state, so
    the route must validate BEFORE allocating: a no-frame POST with a fresh
    stream id, even a flood of them, must leave the slot table untouched."""
    client = app.test_client()
    # touch two real streams so there is state to protect
    for sid in ("evict-a", "evict-b"):
        r = client.post("/analyze", data={"frame": (_jpeg(_frame(1)), "f.jpg"),
                                          "stream_id": sid})
        assert r.status_code == 200
    with engine.lock:
        before = dict(engine.slot_of)
    for i in range(engine.n_slots + 4):
        r = client.post("/analyze", data={"stream_id": f"garbage-{i}"})
        assert r.status_code == 400
    with engine.lock:
        after = dict(engine.slot_of)
    assert before == after


def test_drop_stale_fails_evicted_queued_requests(engine):
    """A request parked in the queue while its stream is LRU-evicted must
    be failed (409), not run — running it would write into the slot's NEW
    owner's freshly-reset state and return the new stream's counters."""
    from real_time_video_deepfake_detection_tpu.serving.multi import _Pending

    live_sid = "stale-live"
    slot = engine.slot_for(live_sid)
    p_live = _Pending(stream_slot=slot, stream_id=live_sid,
                      frame_256=np.zeros((256, 256, 3), np.uint8))
    p_evicted = _Pending(stream_slot=slot, stream_id="stale-evicted",
                         frame_256=np.zeros((256, 256, 3), np.uint8))
    kept = engine._drop_stale([p_live, p_evicted])
    assert kept == [p_live]
    assert p_evicted.event.is_set()
    assert p_evicted.result["status"] == 409
    assert not p_live.event.is_set()


def test_eviction_clears_rate_limit_timestamp():
    """At full load every slot's last_request is fresh; a new stream that
    evicts the LRU slot must not inherit that timestamp (its first request
    would be falsely 429'd)."""
    cfg = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")
    scfg = ServerConfig(max_streams=2, max_batch=2, batch_timeout_ms=2.0,
                        min_request_interval=10.0)   # huge window
    e = MultiStreamEngine(cfg, scfg)
    try:
        for sid in ("rl-a", "rl-b"):
            s = e.slot_for(sid)
            assert e.rate_limited(s) is None       # stamps last_request
        s_new = e.slot_for("rl-c")                  # evicts the LRU
        assert e.rate_limited(s_new) is None, (
            "fresh stream inherited the evicted stream's rate-limit window")
    finally:
        e.shutdown()


def test_admit_atomic_under_concurrency():
    """admit() closes the round-4 advisor TOCTOU: slot resolution + rate
    check + stamp happen under ONE lock acquisition, so N concurrent FIRST
    requests from one brand-new stream admit exactly one and 429 the rest
    (previously the slot_of read and rate_limited() ran in separate
    acquisitions and all N passed). Also verified live against the batched
    HTTP server (3 concurrent curls -> one 200, two 429)."""
    cfg = dataclasses.replace(
        DetectorConfig().with_threshold(0.55), face_backend="heuristic")
    scfg = ServerConfig(max_streams=4, max_batch=4, batch_timeout_ms=2.0,
                        min_request_interval=10.0)
    e = MultiStreamEngine(cfg, scfg)
    try:
        results = []
        barrier = threading.Barrier(8)

        def first_request():
            barrier.wait()
            results.append(e.admit("burst-stream"))

        threads = [threading.Thread(target=first_request) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        slots = {s for s, _ in results}
        assert len(slots) == 1, "one stream mapped to multiple slots"
        admitted = [r for _, r in results if r is None]
        limited = [r for _, r in results if r is not None]
        assert len(admitted) == 1 and len(limited) == 7, results
        assert all(0 < ms <= 10000 for ms in limited)
        # a 429 never stamps: the window still dates from the admit
        slot, retry = e.admit("burst-stream")
        assert retry is not None and retry <= 10000
        # and a DIFFERENT new stream is unaffected by that stream's window
        s2, r2 = e.admit("other-stream")
        assert r2 is None and s2 not in slots
    finally:
        e.shutdown()
