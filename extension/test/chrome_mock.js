// Minimal chrome.* mock for driving the REAL extension scripts
// (background.js service worker + content.js + overlay iframe) inside one
// harness page. Listener registries are context-tagged: the harness sets
// window.__LOADING_CONTEXT__ = "background" | "content" before each script
// tag, so chrome.runtime.sendMessage routes content->background and
// chrome.tabs.sendMessage routes background->content, exactly like the MV3
// message plane the scripts were written against.

(() => {
  const listeners = { background: [], content: [] };
  const storage = {};
  const log = (window.__TEST_LOG__ = window.__TEST_LOG__ || []);

  function dispatch(targetCtx, msg, sender) {
    log.push({ plane: `->${targetCtx}`, type: msg.type });
    const ls = listeners[targetCtx];
    if (!ls.length) return Promise.resolve(undefined);
    return new Promise((resolve) => {
      let async = false;
      for (const fn of ls) {
        const sendResponse = (resp) => resolve(resp);
        const ret = fn(msg, sender || {}, sendResponse);
        if (ret === true) async = true;
      }
      if (!async) resolve(undefined);
    });
  }

  window.chrome = {
    runtime: {
      onMessage: {
        addListener(fn) {
          const ctx = window.__LOADING_CONTEXT__ || "background";
          listeners[ctx].push(fn);
        },
      },
      // content/popup -> service worker
      sendMessage(msg) {
        return dispatch("background", msg, { tab: { id: 1 } });
      },
      getURL(path) {
        return new URL(`../${path}`, window.location.href).href;
      },
      lastError: null,
    },
    tabs: {
      // service worker -> content script in tab
      sendMessage(tabId, msg) {
        return dispatch("content", msg, { id: "background" });
      },
      query: async () => [{ id: 1, url: "https://example.com/watch" }],
    },
    scripting: {
      // harness loads content.js itself; injection is a no-op that records
      executeScript: async (spec) => {
        log.push({ plane: "inject", files: spec.files });
        return [{}];
      },
    },
    storage: {
      local: {
        get: async (keys) => {
          const out = {};
          for (const k of keys) if (k in storage) out[k] = storage[k];
          return out;
        },
        set: async (obj) => {
          Object.assign(storage, obj);
          log.push({ plane: "storage.set", keys: Object.keys(obj) });
        },
      },
    },
    action: { setBadgeText: async () => {}, setBadgeBackgroundColor: async () => {} },
  };
  window.__MOCK_STORAGE__ = storage;
})();
