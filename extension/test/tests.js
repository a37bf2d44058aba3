// Protocol-flow tests driving the REAL background.js + content.js +
// overlay.js against recorded backend responses (fetch_mock.js) over the
// mocked MV3 message plane (chrome_mock.js). Covers the round-4 verdict's
// asked-for flows: start -> reset -> analyze -> overlay update -> stop,
// the localhost->127.0.0.1 fallback, rate-limit handling, and the
// disconnect path.
//
// Runs in any browser (open harness.html) or under node+jsdom via
// tests/test_extension_protocol.py. Results land in window.__RESULTS__.

(() => {
  const results = { passed: 0, failed: 0, details: [] };
  window.__RESULTS__ = null;

  const sleep = (ms) => new Promise((r) => setTimeout(r, ms));

  async function until(fn, timeoutMs = 3000, step = 25) {
    const t0 = Date.now();
    for (;;) {
      try {
        const v = fn();
        if (v) return v;
      } catch (e) {
        /* retry */
      }
      if (Date.now() - t0 > timeoutMs) throw new Error(`timeout: ${fn}`);
      await sleep(step);
    }
  }

  function check(name, cond, extra) {
    if (cond) {
      results.passed += 1;
      results.details.push({ name, ok: true });
    } else {
      results.failed += 1;
      results.details.push({ name, ok: false, extra: String(extra || "") });
    }
  }

  function overlayDoc() {
    const f = document.querySelector('iframe[src$="overlay.html"]');
    return f && f.contentDocument && f.contentDocument.getElementById("verdict")
      ? f.contentDocument
      : null;
  }

  async function main() {
    const scenario = window.__SCENARIO__;
    const calls = window.__FETCH_CALLS__;

    // ---- 1. start with localhost down: 127.0.0.1 fallback ----
    scenario.localhostDown = true;
    window.__MOCK_STORAGE__.captureInterval = 120;
    const startResp = await chrome.runtime.sendMessage({
      type: "detector:startRequest",
      tabId: 1,
    });
    check("start succeeds via 127.0.0.1 fallback", startResp && startResp.ok,
      JSON.stringify(startResp));
    check("health payload surfaced to caller",
      startResp && startResp.health && startResp.health.status === "healthy");
    check("fallback URL persisted to storage",
      window.__MOCK_STORAGE__.backendUrl === "http://127.0.0.1:5000",
      window.__MOCK_STORAGE__.backendUrl);
    check("session start issued /reset (reset == session boundary)",
      scenario.resetCount === 1, scenario.resetCount);
    check("health probed on both hosts before falling back",
      calls.filter((c) => c.url.endsWith("/health")).length >= 1 &&
        calls.some((c) => c.url.includes("127.0.0.1")));

    // ---- 2. first analyze tick updates the overlay ----
    const doc = await until(overlayDoc);
    await until(() => doc.getElementById("m-frames").textContent === "1");
    check("overlay verdict rendered REAL",
      doc.getElementById("verdict").textContent === "REAL");
    check("overlay fake-probability formatted",
      doc.getElementById("m-fake").textContent === "23%",
      doc.getElementById("m-fake").textContent);
    check("overlay analysis mode mapped face+frame -> face",
      doc.getElementById("m-mode").textContent === "face");
    const analyzed0 = calls.filter((c) => c.url.endsWith("/analyze")).length;
    check("analyze POSTed to backend", analyzed0 >= 1);

    // ---- 3. 429 rate-limit: tick swallows it, no overlay change ----
    const framesBefore = doc.getElementById("m-frames").textContent;
    scenario.rateLimitNext = true;
    await until(
      () => calls.filter((c) => c.url.endsWith("/analyze")).length > analyzed0);
    await sleep(80);
    check("rate-limited tick does not advance the overlay frame counter",
      doc.getElementById("m-frames").textContent === framesBefore,
      doc.getElementById("m-frames").textContent);
    check("overlay not marked disconnected by a 429",
      doc.getElementById("verdict").textContent !== "DISCONNECTED");

    // ---- 4. FAKE verdict renders ----
    scenario.analyzeOverride = Object.assign({}, window.__RECORDED__.analyze, {
      is_deepfake: true,
      fake_probability: 0.97,
      confidence_level: "FAKE",
    });
    await until(() => doc.getElementById("verdict").textContent === "FAKE");
    check("overlay FAKE verdict + probability",
      doc.getElementById("m-fake").textContent === "97%",
      doc.getElementById("m-fake").textContent);

    // ---- 5. backend dies: disconnect path ----
    scenario.backendDown = true;
    await until(
      () => doc.getElementById("verdict").textContent === "DISCONNECTED");
    check("overlay status shows unreachable backend",
      doc.getElementById("status").textContent === "Backend unreachable");
    scenario.backendDown = false;

    // ---- 6. stop tears down: overlay removed, reset issued ----
    const resetsBefore = scenario.resetCount;
    const stopResp = await chrome.runtime.sendMessage({
      type: "detector:stopRequest",
      tabId: 1,
    });
    check("stop acks", stopResp && stopResp.ok, JSON.stringify(stopResp));
    await until(() => !document.querySelector('iframe[src$="overlay.html"]'));
    check("overlay iframe removed on stop", true);
    check("content script marked inactive",
      window.__deepfakeDetectorActive === false);
    await until(() => scenario.resetCount > resetsBefore);
    check("session stop issued /reset", true);

    // ---- 7. explicit reset relays the server response ----
    const resetResp = await chrome.runtime.sendMessage({
      type: "detector:resetBackend",
    });
    check("reset relays server payload",
      resetResp && resetResp.success === true, JSON.stringify(resetResp));

    window.__RESULTS__ = results;
    const el = document.getElementById("out");
    if (el) {
      el.textContent =
        `${results.passed} passed / ${results.failed} failed\n` +
        results.details
          .map((d) => `${d.ok ? "PASS" : "FAIL"} ${d.name} ${d.extra || ""}`)
          .join("\n");
    }
  }

  window.addEventListener("load", () => {
    main().catch((e) => {
      results.failed += 1;
      results.details.push({ name: "harness", ok: false, extra: String(e) });
      window.__RESULTS__ = results;
      const el = document.getElementById("out");
      if (el) el.textContent = `HARNESS ERROR: ${e}\n${e.stack || ""}`;
    });
  });
})();
