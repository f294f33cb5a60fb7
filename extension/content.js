// Content script: answers "is this a video page?" for the popup
// (reference extension/content.js behavior, rewritten).

function isVideoPage() {
  const url = window.location.href;
  const host = window.location.hostname;
  const hasVideoEl = () => document.querySelector("video") !== null;

  if (host.includes("youtube.com") || host.includes("youtu.be")) {
    return /\/watch\?|\/shorts\//.test(url) || hasVideoEl();
  }
  if (host.includes("twitter.com") || host.includes("x.com")) {
    return /\/status\/\d+/.test(url) && hasVideoEl();
  }
  if (host.includes("facebook.com") || host.includes("fb.watch")) {
    return /watch|video/.test(url) || hasVideoEl();
  }
  if (host.includes("reddit.com") || host.includes("redd.it")) {
    return /\/comments\//.test(url) && hasVideoEl();
  }
  return false;
}

chrome.runtime.onMessage.addListener((message, sender, sendResponse) => {
  if (message.action === "checkVideoPage") {
    sendResponse({ isVideoPage: isVideoPage(), url: window.location.href });
  }
  return false;
});
