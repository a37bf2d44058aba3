// Node runner for the harness: loads harness.html under jsdom and prints
// window.__RESULTS__ as JSON (exit 1 on failures). Requires `npm i jsdom`.
//
//   node extension/test/run_node.js
//
// The pytest wrapper (tests/test_extension_protocol.py) invokes this when
// node + jsdom are available and skips otherwise (the build environment of
// this repo has no JS runtime at all).

const path = require("path");
const { JSDOM } = require("jsdom");

const file = path.join(__dirname, "harness.html");
JSDOM.fromFile(file, {
  runScripts: "dangerously",
  resources: "usable",
  pretendToBeVisual: true,
}).then((dom) => {
  const t0 = Date.now();
  const timer = setInterval(() => {
    const res = dom.window.__RESULTS__;
    if (res) {
      clearInterval(timer);
      console.log(JSON.stringify(res, null, 2));
      process.exit(res.failed === 0 ? 0 : 1);
    }
    if (Date.now() - t0 > 30000) {
      clearInterval(timer);
      console.error("harness timed out");
      process.exit(2);
    }
  }, 100);
});
