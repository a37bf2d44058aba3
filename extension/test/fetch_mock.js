// Recorded-response fetch mock. Responses are byte-for-byte the schema
// serving/server.py emits (pinned by tests/test_api.py); the scenario
// object lets tests fail localhost to exercise the 127.0.0.1 fallback,
// rate-limit /analyze, or kill the backend for the disconnect path.

(() => {
  const realFetch = window.fetch.bind(window);
  const calls = (window.__FETCH_CALLS__ = []);

  const RECORDED = {
    health: {
      status: "healthy",
      model_loaded: true,
      device: "tpu:0 (TPU v5e)",
      face_detection: "ssd",
    },
    analyze: {
      is_deepfake: false,
      fake_probability: 0.231,
      confidence_level: "REAL",
      temporal_average: 0.2,
      stability_score: 0.91,
      frame_count: 4,
      analysis_mode: "face+frame",
      face_probability: 0.22,
      face_bbox: { x: 120, y: 60, width: 180, height: 200 },
      processing_time_ms: 12.4,
    },
    reset: { success: true, message: "Detection state reset" },
    rate_limited: { error: "Too many requests", retry_after_ms: 87 },
  };

  const scenario = (window.__SCENARIO__ = {
    localhostDown: false, // refuse host "localhost" (fallback drill)
    backendDown: false, // refuse everything (disconnect drill)
    rateLimitNext: false, // next /analyze answers 429
    analyzeOverride: null, // replace the recorded /analyze body once
    resetCount: 0,
  });

  function jsonResponse(body, status = 200) {
    return new Response(JSON.stringify(body), {
      status,
      headers: { "Content-Type": "application/json" },
    });
  }

  window.fetch = async (url, options = {}) => {
    const u = String(url);
    if (u.startsWith("data:")) {
      // decode inline (jsdom's fetch may not support data: URLs):
      // content.js only needs .blob() on a captured JPEG data URL
      const b64 = u.split(",")[1] || "";
      const bin = atob(b64);
      const bytes = new Uint8Array(bin.length);
      for (let i = 0; i < bin.length; i++) bytes[i] = bin.charCodeAt(i);
      return new Response(bytes, {
        status: 200,
        headers: { "Content-Type": "image/jpeg" },
      });
    }
    if (u.startsWith("blob:") || u.startsWith("file:")) {
      return realFetch(url, options);
    }
    calls.push({ url: u, method: (options.method || "GET").toUpperCase() });
    if (scenario.backendDown) throw new TypeError("Failed to fetch");
    if (scenario.localhostDown && new URL(u).hostname === "localhost") {
      throw new TypeError("Failed to fetch");
    }
    if (u.endsWith("/health")) return jsonResponse(RECORDED.health);
    if (u.endsWith("/reset")) {
      scenario.resetCount += 1;
      return jsonResponse(RECORDED.reset);
    }
    if (u.endsWith("/analyze")) {
      if (scenario.rateLimitNext) {
        scenario.rateLimitNext = false;
        return jsonResponse(RECORDED.rate_limited, 429);
      }
      const body = scenario.analyzeOverride || RECORDED.analyze;
      scenario.analyzeOverride = null;
      return jsonResponse(body);
    }
    throw new TypeError(`unexpected url ${u}`);
  };
  window.__RECORDED__ = RECORDED;
})();
