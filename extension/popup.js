// Popup: start/stop control, live metrics, settings persisted to
// chrome.storage.local ({backendUrl, captureInterval}).

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
}

function renderToggle() {
  const b = $("toggle");
  b.textContent = active ? "Stop Detection" : "Start Detection";
  b.className = active ? "stop" : "start";
}

async function pollStats() {
  const s = await chrome.storage.local.get(["backendUrl"]);
  const base = s.backendUrl || "http://localhost:5000";
  try {
    const r = await fetch(`${base}/stats`);
    const j = await r.json();
    $("p-verdict").textContent = j.confidence_level;
    $("p-fake").textContent = `${(j.temporal_average * 100).toFixed(0)}%`;
    $("p-frames").textContent = j.frame_count;
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
      pollTimer = setInterval(pollStats, 1000);
    } else {
      $("backendState").innerHTML =
        `<span class="bad">${(resp && resp.error) || "Failed to start"}</span>`;
    }
  } else {
    await chrome.runtime.sendMessage({ type: "detector:stopRequest", tabId: tab.id });
    active = false;
    if (pollTimer) clearInterval(pollTimer);
  }
  renderToggle();
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
