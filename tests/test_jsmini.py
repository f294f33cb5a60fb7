"""Unit tests for the jsmini JS interpreter (tests/jsmini/).

These pin the language subset the extension sources rely on; the
behavioral extension tests (tests/test_extension_behavior.py) build on
this foundation.
"""

import pytest

from tests.jsmini import Interp, JSThrow, UNDEF, js_to_py


def ev(src, **host_vars):
    """Run src and return js_to_py of the global `out` (or `result`)."""
    interp = Interp()
    for k, v in host_vars.items():
        from tests.jsmini.interp import py_to_js
        interp.genv.declare(k, py_to_js(v))
    interp.run(src)
    g = interp.genv.vars
    return js_to_py(g.get("out", g.get("result", UNDEF)))


# ---- basics ----------------------------------------------------------------

def test_arithmetic_and_precedence():
    assert ev("const out = 2 + 3 * 4;") == 14
    assert ev("const out = (2 + 3) * 4;") == 20
    assert ev("const out = 7 % 3;") == 1
    assert ev("const out = 2 ** 10;") == 1024


def test_string_concat_and_template():
    assert ev("const out = 'a' + 1;") == "a1"
    assert ev("const n = 5; const out = `got ${n + 1} items`;") \
        == "got 6 items"
    assert ev("const out = `${10}%`;") == "10%"  # int formatting, no '.0'


def test_equality_semantics():
    assert ev("const out = 1 === 1.0;") is True
    assert ev("const out = '1' === 1;") is False
    assert ev("const out = null == undefined;") is True
    assert ev("const out = null === undefined;") is False
    assert ev("const out = NaN === NaN;") is False


def test_truthiness_and_logical():
    assert ev("const out = '' || 'fallback';") == "fallback"
    assert ev("const out = 0 && 'x';") == 0
    assert ev("const out = null ?? 'dflt';") == "dflt"
    assert ev("const out = 0 ?? 'dflt';") == 0  # ?? only for null/undefined
    assert ev("const out = undefined ?? null ?? 3;") == 3


def test_var_hoisting_and_function_hoisting():
    assert ev("const out = f(); function f() { return 42; }") == 42


def test_closures_and_arrows():
    src = """
    function counter() {
      let n = 0;
      return () => { n += 1; return n; };
    }
    const c = counter();
    c(); c();
    const out = c();
    """
    assert ev(src) == 3


def test_destructuring():
    src = """
    const { a, b: renamed, missing = 9 } = { a: 1, b: 2 };
    const [x, , z] = [10, 20, 30];
    const out = [a, renamed, missing, x, z];
    """
    assert ev(src) == [1, 2, 9, 10, 30]


def test_param_destructuring_with_defaults():
    src = """
    function req(path, { method = "POST", body, token } = {}) {
      return [path, method, body === undefined, token === undefined];
    }
    const out = [req("/a"), req("/b", { method: "GET", token: "t" })];
    """
    assert ev(src) == [["/a", "POST", True, True],
                      ["/b", "GET", True, False]]


def test_spread_in_object_and_array_and_call():
    src = """
    const base = { a: 1, b: 2 };
    const merged = { success: true, ...base, b: 3 };
    const arr = [0, ...[1, 2], 3];
    function add(x, y, z) { return x + y + z; }
    const out = [merged, arr, add(...[1, 2, 3])];
    """
    assert ev(src) == [{"success": True, "a": 1, "b": 3}, [0, 1, 2, 3], 6]


def test_object_methods_and_shorthand():
    src = """
    const name = "neo";
    const obj = { name, greet() { return "hi " + this.name; } };
    const out = obj.greet();
    """
    assert ev(src) == "hi neo"


def test_for_of_entries_and_classic_for():
    src = """
    const params = { a: "1", b: "2" };
    let s = "";
    for (const [k, v] of Object.entries(params)) { s += k + "=" + v + ";"; }
    let total = 0;
    for (let i = 0; i < 5; i++) { total += i; }
    const out = [s, total];
    """
    assert ev(src) == ["a=1;b=2;", 10]


def test_while_break_continue():
    src = """
    let i = 0; let hits = 0;
    while (true) {
      i += 1;
      if (i % 2 === 0) continue;
      if (i > 7) break;
      hits += 1;
    }
    const out = hits;
    """
    assert ev(src) == 4


def test_try_catch_finally_ordering():
    src = """
    const log = [];
    function f() {
      try {
        throw new Error("boom");
      } catch (err) {
        log.push("caught:" + err.message);
        return "from-catch";
      } finally {
        log.push("finally");
      }
    }
    const out = [f(), log];
    """
    assert ev(src) == ["from-catch", ["caught:boom", "finally"]]


def test_throw_non_error_and_rethrow():
    interp = Interp()
    with pytest.raises(JSThrow):
        interp.run("throw new TypeError('nope');")


def test_regex_literals_and_methods():
    src = """
    const out = [
      /youtube\\.com\\/(watch\\?v=|shorts\\/)|youtu\\.be\\//.test(
        "https://youtu.be/abc"),
      /(twitter\\.com|x\\.com)\\/\\w+\\/status\\/\\d+/.test(
        "https://x.com/user/status/123"),
      /\\/status\\/\\d+/.test("https://x.com/user/profile"),
      "https://sub.site/".replace(/\\/$/, ""),
      "a-b-c".replace(/-/g, "+"),
    ];
    """
    assert ev(src) == [True, True, False, "https://sub.site", "a+b+c"]


def test_string_methods():
    src = """
    const out = [
      "  x  ".trim(),
      "HeLLo".toLowerCase(),
      "abcdef".includes("cde"),
      "abcdef".slice(1, 3),
      "a,b,c".split(","),
      "abc".startsWith("ab"),
    ];
    """
    assert ev(src) == ["x", "hello", True, "bc", ["a", "b", "c"], True]


def test_array_methods():
    src = """
    const a = [3, 1, 2];
    const out = [
      a.some((x) => x > 2),
      a.filter((x) => x !== 1),
      a.map((x) => x * 10),
      a.indexOf(2),
      [1, [2, 3]].flat(),
      a.join("-"),
    ];
    """
    assert ev(src) == [True, [3, 2], [30, 10, 20], 2, [1, 2, 3], "3-1-2"]


def test_array_mutation_methods():
    src = """
    const a = [];
    a.push(1, 2);
    a.splice(0, 1);
    const out = [a, a.length];
    """
    assert ev(src) == [[2], 1]


def test_json_roundtrip():
    src = """
    const body = JSON.stringify({ videoPath: "/tmp/v.mp4", n: 3 });
    const back = JSON.parse(body);
    const out = [body, back.videoPath, back.n];
    """
    assert ev(src) == ['{"videoPath":"/tmp/v.mp4","n":3}', "/tmp/v.mp4", 3]


def test_math_and_date_now_virtual():
    src = """
    const t0 = Date.now();
    const out = [Math.round(2.5), Math.round(-2.5), t0 > 0];
    """
    assert ev(src) == [3, -2, True]  # JS rounds -2.5 to -2 (half-up)


def test_ternary_and_typeof():
    src = """
    let u;
    const out = [typeof u, typeof "s", typeof 1, typeof {},
                 typeof missingGlobal, 1 > 2 ? "a" : "b"];
    """
    assert ev(src) == ["undefined", "string", "number", "object",
                      "undefined", "b"]


def test_optional_chaining():
    src = """
    const obj = { a: { b: 1 } };
    const out = [obj.a?.b, obj.missing?.b, null?.x];
    """
    assert ev(src) == [1, None, None]


def test_iife():
    src = """
    const out = (function () {
      let hidden = "inner";
      return hidden + "-value";
    })();
    """
    assert ev(src) == "inner-value"


# ---- promises & async ------------------------------------------------------

def test_promise_then_chain():
    src = """
    let out = null;
    Promise.resolve(1)
      .then((v) => v + 1)
      .then((v) => { out = v; });
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == 2


def test_promise_catch_recovers():
    src = """
    let out = null;
    Promise.reject(new Error("bad"))
      .then((v) => "not-run")
      .catch((e) => "caught:" + e.message)
      .then((v) => { out = v; });
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == "caught:bad"


def test_async_await_with_new_promise():
    src = """
    function sleep(ms) {
      return new Promise((resolve) => setTimeout(resolve, ms));
    }
    let out = null;
    async function main() {
      const t0 = Date.now();
      await sleep(1500);
      out = Date.now() - t0;
    }
    main();
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == 1500  # virtual time


def test_async_function_rejection_caught():
    src = """
    async function fails() { throw new Error("nope"); }
    let out = null;
    async function main() {
      try {
        await fails();
      } catch (err) {
        out = "caught:" + err.message;
      }
    }
    main();
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == "caught:nope"


def test_await_polling_loop_with_timers():
    """The popup's job-polling shape: for(;;) with await sleep inside."""
    src = """
    function sleep(ms) {
      return new Promise((resolve) => setTimeout(resolve, ms));
    }
    let polls = 0;
    let out = null;
    async function poll() {
      for (;;) {
        await sleep(1000);
        polls += 1;
        if (polls >= 3) { out = "done after " + polls; break; }
      }
    }
    poll();
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == "done after 3"


def test_promise_resolve_adopts_promise():
    src = """
    let out = null;
    const inner = new Promise((resolve) => setTimeout(() => resolve(7), 10));
    Promise.resolve(inner).then((v) => { out = v; });
    """
    interp = Interp()
    interp.run(src)
    interp.drain()
    assert js_to_py(interp.genv.vars["out"]) == 7


def test_update_and_compound_assign():
    src = """
    let n = 0;
    n++; n++; n--;
    let s = "a"; s += "b";
    const out = [n, s];
    """
    assert ev(src) == [1, "ab"]


def test_url_and_search_params():
    src = """
    const url = new URL("/download-video", "http://localhost:5001");
    url.searchParams.set("video_url", "https://youtu.be/x");
    url.searchParams.set("quality", "360p");
    const out = url.toString();
    """
    out = ev(src)
    assert out.startswith("http://localhost:5001/download-video?")
    assert "quality=360p" in out
    assert "video_url=" in out


def test_error_instances_have_message():
    src = """
    const e = new Error("download failed");
    const out = [e.message, typeof e.stack];
    """
    assert ev(src) == ["download failed", "string"]


def test_console_capture():
    interp = Interp()
    interp.run("console.warn('config.js not found', 42);")
    assert interp.console == [("warn", "config.js not found 42")]


def test_negative_and_unary():
    assert ev("const out = -(3) + +'4' + !false;") == 2  # -3 + 4 + 1
