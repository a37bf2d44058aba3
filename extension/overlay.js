// Overlay iframe logic: renders verdicts/metrics posted by content.js.

const $ = (id) => document.getElementById(id);

function setVerdict(level) {
  const v = $("verdict");
  v.classList.remove("real", "fake", "uncertain", "disconnected");
  if (level === "REAL") {
    v.textContent = "REAL";
    v.classList.add("real");
  } else if (level === "FAKE") {
    v.textContent = "FAKE";
    v.classList.add("fake");
  } else if (level === "DISCONNECTED") {
    v.textContent = "DISCONNECTED";
    v.classList.add("disconnected");
  } else {
    v.textContent = "ANALYZING…";
    v.classList.add("uncertain");
  }
}

window.addEventListener("message", (ev) => {
  const msg = ev.data;
  if (!msg || msg.source !== "deepfake-detector") return;
  if (msg.kind === "reset") {
    setVerdict("UNCERTAIN");
    $("m-frames").textContent = "0";
    $("status").textContent = "";
    return;
  }
  if (msg.kind === "status") {
    $("status").textContent = msg.text;
    return;
  }
  if (msg.kind === "disconnected") {
    setVerdict("DISCONNECTED");
    $("status").textContent = "Backend unreachable";
    return;
  }
  if (msg.kind === "result") {
    const r = msg.result;
    $("status").textContent = "";
    setVerdict(r.confidence_level);
    $("m-fake").textContent = `${(r.fake_probability * 100).toFixed(0)}%`;
    $("m-avg").textContent = `${(r.temporal_average * 100).toFixed(0)}%`;
    $("m-stab").textContent = `${(r.stability_score * 100).toFixed(0)}%`;
    $("m-mode").textContent = r.analysis_mode === "face+frame" ? "face" : "frame";
    $("m-speed").textContent = `${r.processing_time_ms} ms`;
    $("m-frames").textContent = msg.frame;
  }
});

$("close").addEventListener("click", () => {
  window.parent.postMessage({ source: "deepfake-overlay", kind: "close" }, "*");
});
