// Content script: finds the most prominent <video> (including same-origin
// iframes), captures frames to JPEG on a timer, sends them to the service
// worker for analysis, and drives the result overlay iframe.
// Reference-extension behaviors preserved: 720 px max capture dimension,
// JPEG quality 0.85, /reset at session start AND stop (reset == session
// boundary), auto-teardown on page unload.

(() => {
  if (window.__deepfakeDetectorActive !== undefined) {
    // Script already injected; the message listener below is live.
    return;
  }
  window.__deepfakeDetectorActive = false;

  const MAX_DIM = 720;
  const JPEG_QUALITY = 0.85;

  let timer = null;
  let overlayFrame = null;
  let frameCounter = 0;

  function findVideo() {
    const collect = (doc) => {
      let vids = Array.from(doc.querySelectorAll("video"));
      for (const frame of doc.querySelectorAll("iframe")) {
        try {
          if (frame.contentDocument) vids = vids.concat(collect(frame.contentDocument));
        } catch (e) {
          /* cross-origin iframe — skip */
        }
      }
      return vids;
    };
    const videos = collect(document).filter(
      (v) => v.videoWidth > 0 && v.videoHeight > 0
    );
    if (!videos.length) return null;
    // biggest on-screen video wins
    videos.sort(
      (a, b) => b.videoWidth * b.videoHeight - a.videoWidth * a.videoHeight
    );
    return videos[0];
  }

  function captureFrame(video) {
    const scale = Math.min(1, MAX_DIM / Math.max(video.videoWidth, video.videoHeight));
    const canvas = document.createElement("canvas");
    canvas.width = Math.round(video.videoWidth * scale);
    canvas.height = Math.round(video.videoHeight * scale);
    const ctx = canvas.getContext("2d");
    ctx.drawImage(video, 0, 0, canvas.width, canvas.height);
    return canvas.toDataURL("image/jpeg", JPEG_QUALITY);
  }

  function ensureOverlay() {
    if (overlayFrame && document.contains(overlayFrame)) return overlayFrame;
    overlayFrame = document.createElement("iframe");
    overlayFrame.src = chrome.runtime.getURL("overlay.html");
    Object.assign(overlayFrame.style, {
      position: "fixed",
      top: "16px",
      right: "16px",
      width: "260px",
      height: "190px",
      border: "none",
      zIndex: 2147483647,
      background: "transparent",
      colorScheme: "normal",
    });
    document.documentElement.appendChild(overlayFrame);
    return overlayFrame;
  }

  function overlayPost(message) {
    const frame = ensureOverlay();
    if (frame.contentWindow) {
      frame.contentWindow.postMessage({ source: "deepfake-detector", ...message }, "*");
    }
  }

  function removeOverlay() {
    if (overlayFrame) {
      overlayFrame.remove();
      overlayFrame = null;
    }
  }

  async function tick() {
    const video = findVideo();
    if (!video) {
      overlayPost({ kind: "status", text: "No video found on page" });
      return;
    }
    let dataUrl;
    try {
      dataUrl = captureFrame(video);
    } catch (e) {
      overlayPost({ kind: "status", text: "Capture blocked (protected video)" });
      return;
    }
    try {
      const result = await chrome.runtime.sendMessage({
        type: "detector:analyzeFrame",
        dataUrl,
      });
      if (result && result.rateLimited) return;
      if (result && result.error) throw new Error(result.error);
      frameCounter += 1;
      overlayPost({ kind: "result", result, frame: frameCounter });
      chrome.runtime.sendMessage({ type: "detector:lastResult", result }).catch?.(() => {});
    } catch (e) {
      overlayPost({ kind: "disconnected", text: String(e) });
    }
  }

  async function start(intervalMs) {
    stopLoop();
    window.__deepfakeDetectorActive = true;
    frameCounter = 0;
    ensureOverlay();
    overlayPost({ kind: "reset" });
    await chrome.runtime.sendMessage({ type: "detector:resetBackend" });
    timer = setInterval(tick, intervalMs);
    tick();
    return { started: true };
  }

  function stopLoop() {
    if (timer) {
      clearInterval(timer);
      timer = null;
    }
  }

  async function stop() {
    stopLoop();
    window.__deepfakeDetectorActive = false;
    removeOverlay();
    await chrome.runtime.sendMessage({ type: "detector:resetBackend" });
    return { stopped: true };
  }

  chrome.runtime.onMessage.addListener((msg, sender, sendResponse) => {
    if (msg.type === "detector:start") {
      start(msg.intervalMs || 1000).then(sendResponse);
      return true;
    }
    if (msg.type === "detector:stop") {
      stop().then(sendResponse);
      return true;
    }
    if (msg.type === "detector:isActive") {
      sendResponse({ active: window.__deepfakeDetectorActive });
    }
  });

  window.addEventListener("pagehide", () => {
    if (window.__deepfakeDetectorActive) stop();
  });

  // Overlay's close button posts back to us.
  window.addEventListener("message", (ev) => {
    if (ev.data && ev.data.source === "deepfake-overlay" && ev.data.kind === "close") {
      stop();
    }
  });
})();
