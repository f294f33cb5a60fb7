// Popup driver: session gate -> platform detection -> download + analyze ->
// result rendering.  Progress reflects the real pipeline phases (download,
// analysis, fact-check) instead of the reference's hardcoded setTimeout
// percentages (SURVEY.md §2.1 #12).

const $ = (id) => document.getElementById(id);

const PLATFORM_LABELS = {
  youtube: "YouTube",
  twitter: "X / Twitter",
  facebook: "Facebook",
  reddit: "Reddit",
};

function send(message) {
  return new Promise((resolve) => chrome.runtime.sendMessage(message, resolve));
}

function detectPlatform(url) {
  if (!url) return null;
  if (/youtube\.com|youtu\.be/.test(url)) return "youtube";
  if (/twitter\.com|x\.com/.test(url)) return "twitter";
  if (/facebook\.com|fb\.watch/.test(url)) return "facebook";
  if (/reddit\.com|redd\.it/.test(url)) return "reddit";
  return null;
}

function setProgress(pct, label) {
  $("progress").classList.remove("hidden");
  $("progress-fill").style.width = `${pct}%`;
  $("progress-label").textContent = label;
}

function showError(message) {
  $("progress").classList.add("hidden");
  const el = $("error");
  el.textContent = message;
  el.classList.remove("hidden");
}

function serverUrl(env) {
  return (env && env.SERVER_URL) || "http://localhost:5001";
}

// Score-band stat labels.  Same contract as the reference popup
// (extension/popup.js:323-337): consistency/anomaly bands flip at 25/75,
// confidence steps at |score-50| > 20 / > 40 (which reproduces the
// reference's fake-branch 70/90 cut points and extends them symmetrically
// to the authentic branch).
function scoreBands(score) {
  const isFake = score > 50;
  const strength = isFake ? (score > 75 ? 2 : 1) : (score < 25 ? 2 : 1);
  const dist = Math.abs(score - 50);
  return {
    consistency: isFake
      ? (strength === 2 ? "Very Low" : "Low")
      : (strength === 2 ? "Very High" : "High"),
    anomalies: isFake
      ? (strength === 2 ? "Very High" : "High")
      : (strength === 2 ? "Very Low" : "Low"),
    confidence: dist > 40 ? "Very High" : dist > 20 ? "High" : "Medium",
  };
}

function displayResults(result, env) {
  $("progress").classList.add("hidden");
  $("results").classList.remove("hidden");
  const score = result.fakeScore ?? 0;
  const isFake = score > 50;
  $("score-num").textContent = score;
  $("score-ring").classList.toggle("fake", isFake);
  $("score-verdict").textContent = isFake
    ? "Likely AI-generated"
    : "Likely authentic";
  $("score-verdict").style.color = isFake ? "#ff8589" : "#5fd99a";
  $("score-detail").textContent = isFake
    ? "Sustained face-embedding drift detected across frames."
    : "Face embeddings stayed consistent across frames.";
  const bands = scoreBands(score);
  $("stat-consistency").textContent = bands.consistency;
  $("stat-anomalies").textContent = bands.anomalies;
  $("stat-confidence").textContent = bands.confidence;

  if (result.verdict !== undefined || result.newsScore !== undefined) {
    $("news-block").classList.remove("hidden");
    $("news-verdict").textContent = result.verdict || "Uncertain";
    $("news-score").textContent =
      result.newsScore !== undefined ? `credibility ${result.newsScore}` : "";
    $("news-summary").textContent = result.newsSummary || "";
    const evidence = $("evidence");
    evidence.textContent = "";
    (result.evidence || []).forEach((src) => {
      const a = document.createElement("a");
      a.href = src.url;
      a.target = "_blank";
      a.rel = "noopener";
      a.textContent = src.title || src.url;
      evidence.appendChild(a);
    });
  }
  if (result.resultId) {
    $("report-link").href = `${serverUrl(env)}/view/${result.resultId}`;
    // Inline annotated-video preview: /video/{id} serves the red-bbox
    // re-encode with Range support, so the <video> element can stream it.
    const preview = $("preview");
    preview.src = `${serverUrl(env)}/video/${result.resultId}`;
    preview.classList.remove("hidden");
  }
}

function sleep(ms) {
  return new Promise((resolve) => setTimeout(resolve, ms));
}

async function startAnalysis(videoUrl, env) {
  $("error").classList.add("hidden");
  $("results").classList.add("hidden");
  $("analyze-btn").disabled = true;
  try {
    setProgress(10, "Downloading video + audio…");
    const dl = await send({ action: "downloadCombined", videoUrl });
    if (!dl || !dl.success) throw new Error((dl && dl.error) || "Download failed");

    // Prefer the async job API (real progress); fall back to the blocking
    // endpoint if the server predates it.
    const submitted = await send({
      action: "submitAnalyzeCombined",
      videoPath: dl.videoPath,
      audioPath: dl.audioPath,
    });
    let analysis;
    if (submitted && submitted.success && submitted.jobId) {
      setProgress(45, "Queued on the detection server…");
      const started = Date.now();
      for (;;) {
        await sleep(1500);
        const job = await send({
          action: "getJobStatus",
          jobId: submitted.jobId,
        });
        if (!job || !job.success) throw new Error("Lost track of the analysis job");
        if (job.status === "failed") throw new Error(job.error || "Analysis failed");
        if (job.status === "done") {
          analysis = job;
          break;
        }
        const secs = Math.round((Date.now() - started) / 1000);
        setProgress(
          job.status === "running" ? 70 : 45,
          job.status === "running"
            ? `Analyzing frames… (${secs}s)`
            : `Queued… (${secs}s)`
        );
      }
    } else {
      setProgress(55, "Analyzing frames on the detection server…");
      analysis = await send({
        action: "analyzeCombined",
        videoPath: dl.videoPath,
        audioPath: dl.audioPath,
      });
      if (!analysis || !analysis.success) {
        throw new Error((analysis && analysis.error) || "Analysis failed");
      }
    }
    setProgress(100, "Done");
    displayResults(analysis, env);
  } catch (err) {
    showError(err.message);
  } finally {
    $("analyze-btn").disabled = false;
  }
}

async function init() {
  const auth = await send({ action: "checkAuth" });
  if (!auth || !auth.isAuthenticated) {
    window.location.href = "auth.html";
    return;
  }
  const env = await send({ action: "getEnvVars" });

  $("logout-btn").addEventListener("click", async () => {
    await send({ action: "logout" });
    window.location.href = "auth.html";
  });

  const [tab] = await chrome.tabs.query({ active: true, currentWindow: true });
  const platform = detectPlatform(tab && tab.url);
  if (!platform) {
    $("platform-name").textContent =
      "Open a YouTube, X, Facebook, or Reddit video to analyze it.";
    return;
  }
  $("platform-name").textContent = `${PLATFORM_LABELS[platform]} page detected`;

  let onVideo = true;
  try {
    const probe = await chrome.tabs.sendMessage(tab.id, {
      action: "checkVideoPage",
    });
    onVideo = !probe || probe.isVideoPage !== false;
  } catch (e) {
    // content script unavailable (e.g. just installed); assume URL is enough
  }
  if (!onVideo) {
    $("platform-name").textContent =
      `${PLATFORM_LABELS[platform]} — no video detected on this page.`;
    return;
  }
  const btn = $("analyze-btn");
  btn.disabled = false;
  btn.addEventListener("click", () => startAnalysis(tab.url, env));
}

init();
