// Service worker: message router between the popup/content scripts and the
// local analysis server.  Same action surface as the reference's worker
// (checkAuth / logout / downloadCombined / analyzeCombined / downloadVideo /
// analyzeVideo / getEnvVars) but pointed at the endpoints the server really
// exposes — the reference's /download and /analyze paths were dead
// (SURVEY.md §2.1 #10).

const SERVER_URL = "http://localhost:5001";

try {
  importScripts("config.js"); // defines self.TRUELY_CONFIG (gitignored)
} catch (e) {
  console.warn("config.js not found; Supabase auth disabled", e);
}

function getEnv() {
  const cfg = self.TRUELY_CONFIG || {};
  return {
    SUPABASE_URL: cfg.SUPABASE_URL || "",
    SUPABASE_ANON_KEY: cfg.SUPABASE_ANON_KEY || "",
    SERVER_URL: cfg.SERVER_URL || SERVER_URL,
  };
}

async function apiGet(path, params) {
  const url = new URL(path, getEnv().SERVER_URL);
  for (const [k, v] of Object.entries(params || {})) {
    if (v !== undefined && v !== null) url.searchParams.set(k, v);
  }
  const resp = await fetch(url.toString());
  const body = await resp.json();
  if (!resp.ok) throw new Error(body.error || `HTTP ${resp.status}`);
  return body;
}

async function apiPost(path, payload) {
  const resp = await fetch(new URL(path, getEnv().SERVER_URL).toString(), {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(payload),
  });
  const body = await resp.json();
  if (!resp.ok) throw new Error(body.error || `HTTP ${resp.status}`);
  return body;
}

function validateVideoUrl(url) {
  if (!url) return false;
  return [
    /youtube\.com\/(watch\?v=|shorts\/)|youtu\.be\//,
    /(twitter\.com|x\.com)\/\w+\/status\/\d+/,
    /facebook\.com\/.*(videos?|watch)|fb\.watch\//,
    /reddit\.com\/r\/[^/]+\/comments\/|redd\.it\//,
  ].some((re) => re.test(url));
}

const handlers = {
  async checkAuth() {
    const { session } = await chrome.storage.local.get("session");
    return { isAuthenticated: !!(session && session.access_token) };
  },

  async logout() {
    await chrome.storage.local.remove("session");
    return { success: true };
  },

  getEnvVars() {
    return getEnv();
  },

  async downloadVideo({ videoUrl, quality }) {
    if (!validateVideoUrl(videoUrl)) throw new Error("Unsupported URL format");
    return apiGet("/download-video", {
      video_url: videoUrl,
      quality: quality || "360p",
    });
  },

  async downloadCombined({ videoUrl, quality, audioFormat }) {
    if (!validateVideoUrl(videoUrl)) throw new Error("Unsupported URL format");
    return apiGet("/download-combined", {
      video_url: videoUrl,
      audio_format: audioFormat || "mp3",
      quality: quality || "360p",
    });
  },

  async analyzeVideo({ videoPath }) {
    return apiPost("/analyze-video", { videoPath });
  },

  async analyzeCombined({ videoPath, audioPath }) {
    return apiPost("/analyze-combined", { videoPath, audioPath });
  },

  // Async job surface: submit + poll, so the popup can show real progress
  // instead of staged percentages.
  async submitAnalyzeCombined({ videoPath, audioPath }) {
    return apiPost("/jobs/analyze-combined", { videoPath, audioPath });
  },

  async getJobStatus({ jobId }) {
    return apiGet(`/jobs/${jobId}`);
  },
};

chrome.runtime.onMessage.addListener((message, sender, sendResponse) => {
  const handler = handlers[message.action];
  if (!handler) {
    sendResponse({ success: false, error: `Unknown action: ${message.action}` });
    return false;
  }
  Promise.resolve(handler(message))
    .then((data) => sendResponse({ success: true, ...data }))
    .catch((err) => sendResponse({ success: false, error: err.message }));
  return true; // keep the channel open for the async response
});
