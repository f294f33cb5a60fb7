// Copy to config.js and fill in your Supabase project values (config.js is
// gitignored).  Without it, auth is bypassed for local development.
self.TRUELY_CONFIG = {
  SUPABASE_URL: "https://YOUR-PROJECT.supabase.co",
  SUPABASE_ANON_KEY: "YOUR-ANON-KEY",
  SERVER_URL: "http://localhost:5001",
};
