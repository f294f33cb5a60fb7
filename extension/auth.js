// Auth screen: Supabase email/password with session persistence in
// chrome.storage.local and refresh-token rotation (reference auth flow,
// rewritten).  Auth gates only the extension UI; the analysis API itself is
// local and unauthenticated, as in the reference (SURVEY.md §3.5).

const $ = (id) => document.getElementById(id);

let mode = "login";
let client = null;

function send(message) {
  return new Promise((resolve) => chrome.runtime.sendMessage(message, resolve));
}

function setMessage(text, ok) {
  const el = $("auth-message");
  el.textContent = text;
  el.className = ok ? "ok" : "err";
}

async function saveSession(session) {
  await chrome.storage.local.set({ session });
}

async function checkExistingSession() {
  const { session } = await chrome.storage.local.get("session");
  if (!session || !client) return false;
  const { error } = await client.auth.getUser(session.access_token);
  if (!error) return true;
  if (session.refresh_token) {
    const { data, error: refreshErr } = await client.auth.refreshSession({
      refresh_token: session.refresh_token,
    });
    if (!refreshErr && data.session) {
      await saveSession(data.session);
      return true;
    }
  }
  await chrome.storage.local.remove("session");
  return false;
}

function switchMode(next) {
  mode = next;
  $("tab-login").classList.toggle("active", mode === "login");
  $("tab-signup").classList.toggle("active", mode === "signup");
  $("submit-btn").textContent = mode === "login" ? "Sign in" : "Create account";
  setMessage("", true);
}

async function onSubmit(event) {
  event.preventDefault();
  if (!client) {
    setMessage("Auth is not configured (missing config.js).", false);
    return;
  }
  const email = $("email").value.trim();
  const password = $("password").value;
  $("submit-btn").disabled = true;
  try {
    if (mode === "login") {
      const { data, error } = await client.auth.signInWithPassword({
        email, password,
      });
      if (error) throw new Error(error.message);
      await saveSession(data.session);
      window.location.href = "popup.html";
    } else {
      const { data, error } = await client.auth.signUp({ email, password });
      if (error) throw new Error(error.message);
      if (data.session && data.session.access_token) {
        await saveSession(data.session);
        window.location.href = "popup.html";
      } else {
        // Switch first: switchMode clears the message area.
        switchMode("login");
        setMessage("Check your email to verify the account, then sign in.", true);
      }
    }
  } catch (err) {
    setMessage(err.message, false);
  } finally {
    $("submit-btn").disabled = false;
  }
}

async function init() {
  const env = await send({ action: "getEnvVars" });
  if (env && env.SUPABASE_URL && env.SUPABASE_ANON_KEY) {
    client = window.supabase.createClient(env.SUPABASE_URL, env.SUPABASE_ANON_KEY);
    if (await checkExistingSession()) {
      window.location.href = "popup.html";
      return;
    }
  } else {
    // No Supabase project configured: let local/dev users straight through.
    await saveSession({ access_token: "local-dev", local: true });
    window.location.href = "popup.html";
    return;
  }
  $("tab-login").addEventListener("click", () => switchMode("login"));
  $("tab-signup").addEventListener("click", () => switchMode("signup"));
  $("auth-form").addEventListener("submit", onSubmit);
}

init();
