// Service worker: owns all backend HTTP traffic (content scripts cannot
// reach localhost directly) and orchestrates start/stop of detection.
// Counterpart of the reference extension's background script behavior:
// health probe with localhost->127.0.0.1 fallback, 10 s analyze timeout,
// programmatic content-script injection.

const DEFAULT_BACKEND = "http://localhost:5000";
const DEFAULT_INTERVAL_MS = 1000;

async function getSettings() {
  const stored = await chrome.storage.local.get(["backendUrl", "captureInterval"]);
  return {
    backendUrl: stored.backendUrl || DEFAULT_BACKEND,
    captureInterval: stored.captureInterval || DEFAULT_INTERVAL_MS,
  };
}

async function fetchWithTimeout(url, options = {}, timeoutMs = 10000) {
  const ctrl = new AbortController();
  const timer = setTimeout(() => ctrl.abort(), timeoutMs);
  try {
    return await fetch(url, { ...options, signal: ctrl.signal });
  } finally {
    clearTimeout(timer);
  }
}

// Probe /health; on failure retry with 127.0.0.1 substituted for localhost.
async function resolveBackend(baseUrl) {
  const candidates = [baseUrl];
  if (baseUrl.includes("localhost")) {
    candidates.push(baseUrl.replace("localhost", "127.0.0.1"));
  }
  for (const url of candidates) {
    try {
      const r = await fetchWithTimeout(`${url}/health`, {}, 5000);
      if (r.ok) return { url, health: await r.json() };
    } catch (e) {
      /* try next */
    }
  }
  return null;
}

async function handleAnalyzeFrame(dataUrl) {
  const { backendUrl } = await getSettings();
  const blob = await (await fetch(dataUrl)).blob();
  const form = new FormData();
  form.append("frame", blob, "frame.jpg");
  const r = await fetchWithTimeout(`${backendUrl}/analyze`, {
    method: "POST",
    body: form,
  });
  if (r.status === 429) {
    const body = await r.json();
    return { rateLimited: true, retryAfterMs: body.retry_after_ms };
  }
  if (!r.ok) throw new Error(`backend ${r.status}`);
  return await r.json();
}

async function handleStart(tabId) {
  const settings = await getSettings();
  const resolved = await resolveBackend(settings.backendUrl);
  if (!resolved) {
    return { ok: false, error: "Backend unreachable. Is the server running?" };
  }
  if (resolved.url !== settings.backendUrl) {
    await chrome.storage.local.set({ backendUrl: resolved.url });
  }
  // Inject the content script on demand, then tell it to begin.
  try {
    await chrome.scripting.executeScript({
      target: { tabId },
      files: ["content.js"],
    });
  } catch (e) {
    return { ok: false, error: `Cannot inject into this page: ${e.message}` };
  }
  const resp = await chrome.tabs.sendMessage(tabId, {
    type: "detector:start",
    intervalMs: settings.captureInterval,
  });
  return { ok: true, health: resolved.health, started: resp };
}

async function handleStop(tabId) {
  try {
    await chrome.tabs.sendMessage(tabId, { type: "detector:stop" });
  } catch (e) {
    /* tab may be gone */
  }
  return { ok: true };
}

async function handleReset() {
  const { backendUrl } = await getSettings();
  try {
    const r = await fetchWithTimeout(`${backendUrl}/reset`, { method: "POST" }, 5000);
    return await r.json();
  } catch (e) {
    return { success: false, error: String(e) };
  }
}

chrome.runtime.onMessage.addListener((msg, sender, sendResponse) => {
  const run = async () => {
    switch (msg.type) {
      case "detector:analyzeFrame":
        return handleAnalyzeFrame(msg.dataUrl);
      case "detector:startRequest":
        return handleStart(msg.tabId);
      case "detector:stopRequest":
        return handleStop(msg.tabId);
      case "detector:resetBackend":
        return handleReset();
      case "detector:health": {
        const { backendUrl } = await getSettings();
        return resolveBackend(backendUrl);
      }
      default:
        return { error: `unknown message ${msg.type}` };
    }
  };
  run()
    .then(sendResponse)
    .catch((e) => sendResponse({ error: String(e) }));
  return true; // async response
});
