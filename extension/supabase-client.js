// Minimal Supabase GoTrue client over fetch (stand-in for supabase-js, like
// the reference's hand-rolled bundle — rewritten): signInWithPassword,
// signUp, getUser, refreshSession, signOut, onAuthStateChange.

(function () {
  function createClient(supabaseUrl, anonKey) {
    const authUrl = `${supabaseUrl.replace(/\/$/, "")}/auth/v1`;
    const listeners = [];

    async function request(path, { method = "POST", body, token } = {}) {
      const resp = await fetch(`${authUrl}${path}`, {
        method,
        headers: {
          "Content-Type": "application/json",
          apikey: anonKey,
          Authorization: `Bearer ${token || anonKey}`,
        },
        body: body ? JSON.stringify(body) : undefined,
      });
      const data = await resp.json().catch(() => ({}));
      if (!resp.ok) {
        const msg = data.error_description || data.msg || data.message || "auth error";
        return { data: null, error: { message: msg, status: resp.status } };
      }
      return { data, error: null };
    }

    function emit(event, session) {
      listeners.forEach((fn) => {
        try { fn(event, session); } catch (e) { console.error(e); }
      });
    }

    const auth = {
      async signInWithPassword({ email, password }) {
        const { data, error } = await request("/token?grant_type=password", {
          body: { email, password },
        });
        if (error) return { data: null, error };
        emit("SIGNED_IN", data);
        return { data: { session: data, user: data.user }, error: null };
      },

      async signUp({ email, password }) {
        const { data, error } = await request("/signup", {
          body: { email, password },
        });
        if (error) return { data: null, error };
        return { data: { session: data.access_token ? data : null, user: data.user || data }, error: null };
      },

      async getUser(token) {
        const { data, error } = await request("/user", { method: "GET", token });
        if (error) return { data: null, error };
        return { data: { user: data }, error: null };
      },

      async refreshSession({ refresh_token }) {
        const { data, error } = await request("/token?grant_type=refresh_token", {
          body: { refresh_token },
        });
        if (error) return { data: null, error };
        emit("TOKEN_REFRESHED", data);
        return { data: { session: data, user: data.user }, error: null };
      },

      async signOut(token) {
        await request("/logout", { token });
        emit("SIGNED_OUT", null);
        return { error: null };
      },

      onAuthStateChange(callback) {
        listeners.push(callback);
        return { data: { subscription: { unsubscribe() {
          const i = listeners.indexOf(callback);
          if (i >= 0) listeners.splice(i, 1);
        } } } };
      },
    };

    return { auth };
  }

  window.supabase = { createClient };
})();
