// Popup: start/stop control, live metrics dashboard, settings persisted to
// chrome.storage.local ({backendUrl, captureInterval}).
//
// Live data arrives two ways: pushed `detector:lastResult` messages from the
// content script (per-frame /analyze responses: verdict, probabilities,
// stability, mode, speed — the reference popup's dashboard fields,
// extension/popup.js:181-237 in the upstream), plus a 1 Hz /stats poll as a
// fallback when the popup opens mid-session.

const $ = (id) => document.getElementById(id);
let active = false;
let pollTimer = null;

async function currentTab() {
  const [tab] = await chrome.tabs.query({ active: true, currentWindow: true });
  return tab;
}

async function loadSettings() {
  const s = await chrome.storage.local.get(["backendUrl", "captureInterval"]);
  $("backendUrl").value = s.backendUrl || "http://localhost:5000";
  $("captureInterval").value = s.captureInterval || 1000;
  $("interval-val").textContent = `${$("captureInterval").value} ms`;
}

async function saveSettings() {
  await chrome.storage.local.set({
    backendUrl: $("backendUrl").value.trim(),
    captureInterval: parseInt($("captureInterval").value, 10),
  });
}

async function refreshBackendState() {
  const resolved = await chrome.runtime.sendMessage({ type: "detector:health" });
  const el = $("backendState");
  if (resolved && resolved.health) {
    const dev = resolved.health.device || "?";
    el.innerHTML = `<span class="ok">● Backend online</span> (${dev})`;
    return true;
  }
  el.innerHTML = `<span class="bad">● Backend offline</span> — start the server`;
  return false;
}

async function refreshActive() {
  const tab = await currentTab();
  try {
    const resp = await chrome.tabs.sendMessage(tab.id, { type: "detector:isActive" });
    active = Boolean(resp && resp.active);
  } catch (e) {
    active = false;
  }
  renderToggle();
  setStatus(active ? "analyzing" : "");
  if (active && !pollTimer) pollTimer = setInterval(pollStats, 1000);
}

function renderToggle() {
  const b = $("toggle");
  b.textContent = active ? "Stop Detection" : "Start Detection";
  b.className = active ? "stop" : "start";
}

function setStatus(state) {
  const dot = $("statusDot"), txt = $("statusText");
  dot.className = "status-dot" + (state ? " " + state : "");
  txt.textContent = { "": "Inactive", analyzing: "Analyzing…",
                      active: "Authentic Video",
                      alert: "Deepfake Detected!" }[state] || "Inactive";
}

function renderResult(d) {
  if (!d) return;
  const verdict = d.confidence_level || "UNCERTAIN";
  const v = $("p-verdict");
  if (verdict === "UNCERTAIN") {
    v.textContent = "ANALYZING";
    v.className = "";
  } else {
    v.textContent = verdict;
    v.className = verdict.toLowerCase().replace("_", "-");
  }
  if (d.fake_probability !== undefined)
    $("p-fake").textContent = `${(d.fake_probability * 100).toFixed(1)}%`;
  if (d.temporal_average !== undefined) {
    const t = (d.temporal_average * 100).toFixed(1);
    $("p-temporal").textContent = `${t}%`;
    $("temporal-bar").firstElementChild.style.width = `${t}%`;
  }
  if (d.stability_score !== undefined) {
    const s = (d.stability_score * 100).toFixed(1);
    $("p-stability").textContent = `${s}%`;
    $("stability-bar").firstElementChild.style.width = `${s}%`;
  }
  if (d.analysis_mode)
    $("p-mode").textContent =
      { "face+frame": "Face + Frame", frame_only: "Frame Only" }[d.analysis_mode]
      || d.analysis_mode;
  if (d.frame_count !== undefined) $("p-frames").textContent = d.frame_count;
  if (d.processing_time_ms !== undefined)
    $("p-speed").textContent = `${d.processing_time_ms} ms`;

  if (verdict === "FAKE" || verdict === "HIGH_FAKE") setStatus("alert");
  else if (verdict === "REAL" || verdict === "HIGH_REAL") setStatus("active");
  else setStatus("analyzing");
}

function resetResults() {
  $("p-verdict").textContent = "ANALYZING";
  $("p-verdict").className = "";
  $("p-fake").textContent = "0.0%";
  $("p-temporal").textContent = "0.0%";
  $("temporal-bar").firstElementChild.style.width = "0%";
  $("p-stability").textContent = "0.0%";
  $("stability-bar").firstElementChild.style.width = "0%";
  $("p-mode").textContent = "–";
  $("p-frames").textContent = "0";
  $("p-speed").textContent = "–";
  setStatus(active ? "analyzing" : "");
}

// Live per-frame results broadcast by the content script.
chrome.runtime.onMessage.addListener((msg) => {
  if (msg && msg.type === "detector:lastResult") renderResult(msg.result);
});

async function pollStats() {
  const s = await chrome.storage.local.get(["backendUrl"]);
  const base = s.backendUrl || "http://localhost:5000";
  try {
    const r = await fetch(`${base}/stats`);
    const j = await r.json();
    renderResult({
      confidence_level: j.confidence_level,
      temporal_average: j.temporal_average,
      stability_score: j.stability_score,
      frame_count: j.frame_count,
    });
  } catch (e) {
    /* backend gone */
  }
}

$("toggle").addEventListener("click", async () => {
  await saveSettings();
  const tab = await currentTab();
  if (!active) {
    const resp = await chrome.runtime.sendMessage({
      type: "detector:startRequest",
      tabId: tab.id,
    });
    if (resp && resp.ok) {
      active = true;
      resetResults();
      pollTimer = setInterval(pollStats, 1000);
    } else {
      $("backendState").innerHTML =
        `<span class="bad">${(resp && resp.error) || "Failed to start"}</span>`;
    }
  } else {
    await chrome.runtime.sendMessage({ type: "detector:stopRequest", tabId: tab.id });
    active = false;
    if (pollTimer) { clearInterval(pollTimer); pollTimer = null; }
    resetResults();
  }
  renderToggle();
  setStatus(active ? "analyzing" : "");
});

$("testConnection").addEventListener("click", async () => {
  const el = $("backendState");
  el.textContent = "Testing backend…";
  const base = $("backendUrl").value.trim() || "http://localhost:5000";
  try {
    const r = await fetch(`${base}/health`);
    if (r.ok) {
      const j = await r.json();
      el.innerHTML = `<span class="ok">● Backend OK</span> — model ` +
        `${j.model_loaded ? "loaded" : "not loaded"}, device ${j.device}`;
    } else {
      el.innerHTML = `<span class="bad">● Backend error ${r.status}</span>`;
    }
  } catch (err) {
    el.innerHTML = `<span class="bad">● Backend failed: ${err.message}</span>`;
  }
});

$("captureInterval").addEventListener("input", () => {
  $("interval-val").textContent = `${$("captureInterval").value} ms`;
});
$("captureInterval").addEventListener("change", saveSettings);
$("backendUrl").addEventListener("change", saveSettings);

loadSettings().then(() => {
  refreshBackendState();
  refreshActive();
});
