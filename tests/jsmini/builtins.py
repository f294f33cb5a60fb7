"""Built-in objects and method dispatch for jsmini.

Covers the standard-library surface the extension sources touch: string /
array / object methods, JSON, Math, Date.now, Promise, Error types, URL +
URLSearchParams, timers, console, encodeURIComponent.  Host-specific APIs
(chrome.*, fetch, DOM) live in tests/jsmini/host.py.
"""

from __future__ import annotations

import math
import re
import urllib.parse

from tests.jsmini.interp import (
    UNDEF, JSArray, JSFunction, JSObject, JSPromise, JSRegExp, JSThrow,
    NativeFunction, make_error, num_to_str, strict_eq, to_js_string,
    to_number, truthy, js_json_parse, js_json_stringify,
)


def nf(name):
    def deco(fn):
        return NativeFunction(fn, name)
    return deco


def _call(interp, fn, args):
    return interp.call(fn, args)


# ---- member dispatch -------------------------------------------------------

def get_member(interp, obj, key):
    if obj is None or obj is UNDEF:
        raise JSThrow(make_error(
            "TypeError",
            f"Cannot read properties of {to_js_string(obj)} "
            f"(reading '{key}')"))
    if isinstance(obj, JSObject):
        if key in obj.props:
            return obj.props[key]
        return UNDEF
    if isinstance(obj, JSArray):
        return array_member(interp, obj, key)
    if isinstance(obj, str):
        return string_member(interp, obj, key)
    if isinstance(obj, JSPromise):
        return promise_member(interp, obj, key)
    if isinstance(obj, JSRegExp):
        return regex_member(interp, obj, key)
    if isinstance(obj, (float, int, bool)):
        return number_member(interp, obj, key)
    if isinstance(obj, (JSFunction, NativeFunction)):
        if key == "name":
            return obj.name
        if key == "call":
            @nf("call")
            def call_fn(i, this, args):
                return i.call(obj, args[1:],
                              this=args[0] if args else UNDEF)
            return call_fn
        if key == "apply":
            @nf("apply")
            def apply_fn(i, this, args):
                spread = args[1].items if len(args) > 1 and \
                    isinstance(args[1], JSArray) else []
                return i.call(obj, spread, this=args[0] if args else UNDEF)
            return apply_fn
        return UNDEF
    return UNDEF


def set_member(interp, obj, key, value):
    if isinstance(obj, JSObject):
        setter = obj.props.get("__set__")
        if isinstance(setter, NativeFunction):
            setter.fn(interp, obj, [key, value])
            return
        obj.props[key] = value
        watcher = obj.props.get("__onset__")
        if watcher is not None and not isinstance(watcher, (str, float)):
            interp.call(watcher, [key, value], this=obj)
        return
    if isinstance(obj, JSArray):
        if key == "length":
            n = int(to_number(value))
            del obj.items[n:]
            obj.items.extend([UNDEF] * (n - len(obj.items)))
            return
        try:
            idx = int(key) if not isinstance(key, (int, float)) else int(key)
        except ValueError:
            return
        while len(obj.items) <= idx:
            obj.items.append(UNDEF)
        obj.items[idx] = value
        return
    raise JSThrow(make_error(
        "TypeError", f"Cannot set property {key!r} on {to_js_string(obj)}"))


# ---- strings ---------------------------------------------------------------

def string_member(interp, s, key):
    if key == "length":
        return float(len(s))
    try:
        idx = int(key)
        if 0 <= idx < len(s):
            return s[idx]
    except (ValueError, TypeError):
        pass

    if key == "replace":
        @nf("replace")
        def replace(i, this, args):
            pat, repl = args[0], args[1] if len(args) > 1 else UNDEF
            def do_repl(m):
                if isinstance(repl, (JSFunction, NativeFunction)):
                    groups = [m.group(0)] + [
                        g if g is not None else UNDEF
                        for g in m.groups()]
                    return to_js_string(i.call(repl, groups))
                text = to_js_string(repl)
                out, j = [], 0
                while j < len(text):
                    if text[j] == "$" and j + 1 < len(text):
                        c = text[j + 1]
                        if c == "$":
                            out.append("$")
                            j += 2
                            continue
                        if c == "&":
                            out.append(m.group(0))
                            j += 2
                            continue
                        if c.isdigit():
                            gi = int(c)
                            if 1 <= gi <= len(m.groups()):
                                out.append(m.group(gi) or "")
                                j += 2
                                continue
                    out.append(text[j])
                    j += 1
                return "".join(out)
            if isinstance(pat, JSRegExp):
                count = 0 if pat.global_ else 1
                return pat.rx.sub(do_repl, s, count=count)
            pat_s = to_js_string(pat)
            idx2 = s.find(pat_s)
            if idx2 < 0:
                return s
            m = re.match(re.escape(pat_s), s[idx2:])
            return s[:idx2] + do_repl(m) + s[idx2 + len(pat_s):]
        return replace

    simple = {
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
    }
    if key in simple:
        f = simple[key]
        return NativeFunction(lambda i, t, a, f=f: f(), key)

    if key == "includes":
        return NativeFunction(
            lambda i, t, a: to_js_string(a[0]) in s, key)
    if key == "startsWith":
        return NativeFunction(
            lambda i, t, a: s.startswith(to_js_string(a[0])), key)
    if key == "endsWith":
        return NativeFunction(
            lambda i, t, a: s.endswith(to_js_string(a[0])), key)
    if key == "indexOf":
        return NativeFunction(
            lambda i, t, a: float(s.find(to_js_string(a[0]))), key)
    if key == "charAt":
        return NativeFunction(
            lambda i, t, a: s[int(to_number(a[0]))]
            if 0 <= int(to_number(a[0])) < len(s) else "", key)
    if key == "slice":
        return NativeFunction(lambda i, t, a: _py_slice(s, a), key)
    if key == "substring":
        @nf("substring")
        def substring(i, t, a):
            start = max(0, int(to_number(a[0]))) if a else 0
            end = max(0, int(to_number(a[1]))) if len(a) > 1 else len(s)
            if start > end:
                start, end = end, start
            return s[start:end]
        return substring
    if key == "split":
        @nf("split")
        def split(i, t, a):
            if not a or a[0] is UNDEF:
                return JSArray([s])
            sep = a[0]
            if isinstance(sep, JSRegExp):
                return JSArray(sep.rx.split(s))
            sep = to_js_string(sep)
            if sep == "":
                return JSArray(list(s))
            return JSArray(s.split(sep))
        return split
    if key == "match":
        @nf("match")
        def match(i, t, a):
            rx = a[0]
            if not isinstance(rx, JSRegExp):
                rx = JSRegExp(to_js_string(rx), "")
            if rx.global_:
                found = rx.rx.findall(s)
                return JSArray(found) if found else None
            m = rx.rx.search(s)
            if not m:
                return None
            return JSArray([m.group(0)] + [
                g if g is not None else UNDEF for g in m.groups()])
        return match
    if key == "repeat":
        return NativeFunction(
            lambda i, t, a: s * int(to_number(a[0])), key)
    if key == "padStart":
        @nf("padStart")
        def pad_start(i, t, a):
            width = int(to_number(a[0]))
            fill = to_js_string(a[1]) if len(a) > 1 else " "
            out = s
            while len(out) < width:
                out = fill[:width - len(out)] + out
            return out
        return pad_start
    if key == "concat":
        return NativeFunction(
            lambda i, t, a: s + "".join(to_js_string(x) for x in a), key)
    if key == "toString":
        return NativeFunction(lambda i, t, a: s, key)
    return UNDEF


def _py_slice(seq, args):
    start = int(to_number(args[0])) if args and args[0] is not UNDEF else 0
    end = int(to_number(args[1])) if len(args) > 1 and args[1] is not UNDEF \
        else None
    return seq[start:end]


# ---- numbers ---------------------------------------------------------------

def number_member(interp, n, key):
    if key == "toFixed":
        return NativeFunction(
            lambda i, t, a: f"{to_number(n):.{int(to_number(a[0])) if a else 0}f}",
            key)
    if key == "toString":
        return NativeFunction(lambda i, t, a: num_to_str(float(n)), key)
    return UNDEF


# ---- arrays ----------------------------------------------------------------

def array_member(interp, arr, key):
    items = arr.items
    if key == "length":
        return float(len(items))
    try:
        idx = int(key) if not isinstance(key, float) else int(key)
        if str(idx) == str(key).split(".")[0]:
            return items[idx] if 0 <= idx < len(items) else UNDEF
    except (ValueError, TypeError):
        pass

    if key == "push":
        @nf("push")
        def push(i, t, a):
            items.extend(a)
            return float(len(items))
        return push
    if key == "pop":
        return NativeFunction(
            lambda i, t, a: items.pop() if items else UNDEF, key)
    if key == "shift":
        return NativeFunction(
            lambda i, t, a: items.pop(0) if items else UNDEF, key)
    if key == "unshift":
        @nf("unshift")
        def unshift(i, t, a):
            items[:0] = a
            return float(len(items))
        return unshift
    if key == "forEach":
        @nf("forEach")
        def for_each(i, t, a):
            for idx2, v in enumerate(list(items)):
                i.call(a[0], [v, float(idx2), arr])
            return UNDEF
        return for_each
    if key == "map":
        @nf("map")
        def map_fn(i, t, a):
            return JSArray([i.call(a[0], [v, float(idx2), arr])
                            for idx2, v in enumerate(list(items))])
        return map_fn
    if key == "filter":
        @nf("filter")
        def filter_fn(i, t, a):
            return JSArray([v for idx2, v in enumerate(list(items))
                            if truthy(i.call(a[0], [v, float(idx2), arr]))])
        return filter_fn
    if key == "some":
        @nf("some")
        def some(i, t, a):
            return any(truthy(i.call(a[0], [v, float(idx2), arr]))
                       for idx2, v in enumerate(list(items)))
        return some
    if key == "every":
        @nf("every")
        def every(i, t, a):
            return all(truthy(i.call(a[0], [v, float(idx2), arr]))
                       for idx2, v in enumerate(list(items)))
        return every
    if key == "find":
        @nf("find")
        def find(i, t, a):
            for idx2, v in enumerate(list(items)):
                if truthy(i.call(a[0], [v, float(idx2), arr])):
                    return v
            return UNDEF
        return find
    if key == "findIndex":
        @nf("findIndex")
        def find_index(i, t, a):
            for idx2, v in enumerate(list(items)):
                if truthy(i.call(a[0], [v, float(idx2), arr])):
                    return float(idx2)
            return -1.0
        return find_index
    if key == "indexOf":
        @nf("indexOf")
        def index_of(i, t, a):
            for idx2, v in enumerate(items):
                if strict_eq(v, a[0]):
                    return float(idx2)
            return -1.0
        return index_of
    if key == "includes":
        @nf("includes")
        def includes(i, t, a):
            return any(strict_eq(v, a[0]) for v in items)
        return includes
    if key == "join":
        @nf("join")
        def join(i, t, a):
            sep = to_js_string(a[0]) if a and a[0] is not UNDEF else ","
            return sep.join(
                "" if v is None or v is UNDEF else to_js_string(v)
                for v in items)
        return join
    if key == "slice":
        return NativeFunction(
            lambda i, t, a: JSArray(_py_slice(items, a)), key)
    if key == "splice":
        @nf("splice")
        def splice(i, t, a):
            start = int(to_number(a[0])) if a else 0
            if start < 0:
                start = max(0, len(items) + start)
            count = int(to_number(a[1])) if len(a) > 1 else \
                len(items) - start
            removed = items[start:start + count]
            items[start:start + count] = list(a[2:])
            return JSArray(removed)
        return splice
    if key == "concat":
        @nf("concat")
        def concat(i, t, a):
            out = list(items)
            for x in a:
                out.extend(x.items if isinstance(x, JSArray) else [x])
            return JSArray(out)
        return concat
    if key == "flat":
        @nf("flat")
        def flat(i, t, a):
            out = []
            for x in items:
                out.extend(x.items if isinstance(x, JSArray) else [x])
            return JSArray(out)
        return flat
    if key == "reduce":
        @nf("reduce")
        def reduce_fn(i, t, a):
            acc = a[1] if len(a) > 1 else None
            seq = list(items)
            if acc is None:
                acc, seq = seq[0], seq[1:]
            for idx2, v in enumerate(seq):
                acc = i.call(a[0], [acc, v, float(idx2), arr])
            return acc
        return reduce_fn
    if key == "sort":
        @nf("sort")
        def sort(i, t, a):
            import functools
            if a and a[0] is not UNDEF:
                items.sort(key=functools.cmp_to_key(
                    lambda x, y: (lambda r: -1 if r < 0 else
                                  (1 if r > 0 else 0))(
                        to_number(i.call(a[0], [x, y])))))
            else:
                items.sort(key=to_js_string)
            return arr
        return sort
    if key == "reverse":
        @nf("reverse")
        def reverse(i, t, a):
            items.reverse()
            return arr
        return reverse
    if key == "toString":
        return NativeFunction(lambda i, t, a: to_js_string(arr), key)
    return UNDEF


# ---- promises --------------------------------------------------------------

def promise_member(interp, p, key):
    if key == "then":
        @nf("then")
        def then(i, t, a):
            on_f = a[0] if a and a[0] is not UNDEF and a[0] is not None \
                else None
            on_r = a[1] if len(a) > 1 and a[1] is not UNDEF and \
                a[1] is not None else None
            return p.then(on_f, on_r)
        return then
    if key == "catch":
        @nf("catch")
        def catch(i, t, a):
            return p.then(None, a[0] if a else None)
        return catch
    if key == "finally":
        @nf("finally")
        def finally_fn(i, t, a):
            cb = a[0] if a else None

            def on_f(v):
                if cb:
                    interp.call(cb, [])
                return v

            def on_r(e):
                if cb:
                    interp.call(cb, [])
                raise JSThrow(e)
            return p.then(NativeFunction(lambda i2, t2, a2: on_f(a2[0])),
                          NativeFunction(lambda i2, t2, a2: on_r(a2[0])))
        return finally_fn
    return UNDEF


# ---- regex -----------------------------------------------------------------

def regex_member(interp, rx, key):
    if key == "test":
        return NativeFunction(
            lambda i, t, a: rx.rx.search(to_js_string(a[0])) is not None,
            key)
    if key == "exec":
        @nf("exec")
        def exec_fn(i, t, a):
            m = rx.rx.search(to_js_string(a[0]))
            if not m:
                return None
            return JSArray([m.group(0)] + [
                g if g is not None else UNDEF for g in m.groups()])
        return exec_fn
    if key == "source":
        return rx.source
    if key == "flags":
        return rx.flags
    return UNDEF


# ---- globals ---------------------------------------------------------------

def install_globals(interp):
    g = interp.genv

    # console -------------------------------------------------------------
    def log_level(level):
        @nf(level)
        def log(i, t, a):
            i.console.append(
                (level, " ".join(to_js_string(x) for x in a)))
            return UNDEF
        return log

    g.declare("console", JSObject({
        "log": log_level("log"),
        "warn": log_level("warn"),
        "error": log_level("error"),
        "info": log_level("info"),
        "debug": log_level("debug"),
    }))

    # JSON ------------------------------------------------------------------
    @nf("stringify")
    def json_stringify(i, t, a):
        v = a[0] if a else UNDEF
        indent = None
        if len(a) > 2 and a[2] is not UNDEF and a[2] is not None:
            indent = int(to_number(a[2])) if not isinstance(a[2], str) \
                else a[2]
        return js_json_stringify(v, indent)

    @nf("parse")
    def json_parse(i, t, a):
        try:
            return js_json_parse(to_js_string(a[0]))
        except Exception:
            raise JSThrow(make_error(
                "SyntaxError",
                f"Unexpected token in JSON: {to_js_string(a[0])[:40]!r}"))

    g.declare("JSON", JSObject({
        "stringify": json_stringify, "parse": json_parse}))

    # Object ----------------------------------------------------------------
    @nf("entries")
    def obj_entries(i, t, a):
        o = a[0]
        if isinstance(o, JSObject):
            return JSArray([JSArray([k, v]) for k, v in o.props.items()
                            if not k.startswith("__")])
        if isinstance(o, JSArray):
            return JSArray([JSArray([str(k), v])
                            for k, v in enumerate(o.items)])
        return JSArray([])

    @nf("keys")
    def obj_keys(i, t, a):
        o = a[0]
        if isinstance(o, JSObject):
            return JSArray([k for k in o.props if not k.startswith("__")])
        if isinstance(o, JSArray):
            return JSArray([str(k) for k in range(len(o.items))])
        return JSArray([])

    @nf("values")
    def obj_values(i, t, a):
        o = a[0]
        if isinstance(o, JSObject):
            return JSArray([v for k, v in o.props.items()
                            if not k.startswith("__")])
        if isinstance(o, JSArray):
            return JSArray(list(o.items))
        return JSArray([])

    @nf("assign")
    def obj_assign(i, t, a):
        target = a[0]
        for src in a[1:]:
            if isinstance(src, JSObject):
                target.props.update(src.props)
        return target

    @nf("fromEntries")
    def obj_from_entries(i, t, a):
        out = JSObject()
        for pair in i.iterate(a[0]):
            kv = i.iterate(pair)
            out.props[to_js_string(kv[0])] = kv[1] if len(kv) > 1 else UNDEF
        return out

    @nf("freeze")
    def obj_freeze(i, t, a):
        return a[0] if a else UNDEF

    g.declare("Object", JSObject({
        "entries": obj_entries, "keys": obj_keys, "values": obj_values,
        "assign": obj_assign, "fromEntries": obj_from_entries,
        "freeze": obj_freeze,
    }))

    # Array -----------------------------------------------------------------
    @nf("isArray")
    def is_array(i, t, a):
        return isinstance(a[0], JSArray) if a else False

    @nf("from")
    def array_from(i, t, a):
        items = i.iterate(a[0])
        if len(a) > 1:
            items = [i.call(a[1], [v, float(ix)])
                     for ix, v in enumerate(items)]
        return JSArray(items)

    g.declare("Array", JSObject({"isArray": is_array, "from": array_from}))

    # Math ------------------------------------------------------------------
    def math1(name, fn):
        return NativeFunction(
            lambda i, t, a: float(fn(to_number(a[0]))), name)

    g.declare("Math", JSObject({
        "round": math1("round", lambda x: math.floor(x + 0.5)),
        "floor": math1("floor", math.floor),
        "ceil": math1("ceil", math.ceil),
        "abs": math1("abs", abs),
        "trunc": math1("trunc", math.trunc),
        "sqrt": math1("sqrt", math.sqrt),
        "min": NativeFunction(
            lambda i, t, a: min((to_number(x) for x in a),
                                default=float("inf")), "min"),
        "max": NativeFunction(
            lambda i, t, a: max((to_number(x) for x in a),
                                default=float("-inf")), "max"),
        "random": NativeFunction(lambda i, t, a: 0.5, "random"),
        "pow": NativeFunction(
            lambda i, t, a: to_number(a[0]) ** to_number(a[1]), "pow"),
    }))

    # Date ------------------------------------------------------------------
    @nf("Date")
    def date_ctor(i, t, a):
        # `new Date()` / `Date.now()` both expose only the virtual clock.
        return JSObject({
            "getTime": NativeFunction(lambda i2, t2, a2: i2.vclock,
                                      "getTime"),
            "toISOString": NativeFunction(
                lambda i2, t2, a2: "1970-01-01T00:00:00.000Z",
                "toISOString"),
        }, class_name="Date")
    date_obj = date_ctor
    g.declare("Date", date_obj)
    # Date.now as a property of the NativeFunction: route through a wrapper
    # object instead — calls (new and plain) hit date_ctor, member access
    # goes through get_member which only supports name/call/apply.  Simplest:
    # replace with JSObject carrying both callable-ness via __call__ marker.
    now_fn = NativeFunction(lambda i, t, a: i.vclock, "now")
    date_wrapper = JSObject({"now": now_fn, "__ctor__": date_ctor},
                            class_name="DateConstructor")
    g.vars["Date"] = date_wrapper

    # Promise ---------------------------------------------------------------
    @nf("Promise")
    def promise_ctor(i, t, a):
        p = JSPromise(i)
        executor = a[0] if a else None
        resolve = NativeFunction(
            lambda i2, t2, a2: (p.resolve(a2[0] if a2 else UNDEF), UNDEF)[1],
            "resolve")
        reject = NativeFunction(
            lambda i2, t2, a2: (p.reject(a2[0] if a2 else UNDEF), UNDEF)[1],
            "reject")
        if executor is not None:
            try:
                i.call(executor, [resolve, reject])
            except JSThrow as e:
                p.reject(e.value)
        return p

    @nf("resolve")
    def promise_resolve(i, t, a):
        v = a[0] if a else UNDEF
        if isinstance(v, JSPromise):
            return v
        p = JSPromise(i)
        p.resolve(v)
        return p

    @nf("reject")
    def promise_reject(i, t, a):
        p = JSPromise(i)
        p.reject(a[0] if a else UNDEF)
        return p

    @nf("all")
    def promise_all(i, t, a):
        entries = i.iterate(a[0])
        out = JSPromise(i)
        results = [UNDEF] * len(entries)
        remaining = [len(entries)]
        if not entries:
            out.resolve(JSArray([]))
            return out
        for idx, entry in enumerate(entries):
            pe = entry if isinstance(entry, JSPromise) else None

            def on_f(v, idx=idx):
                results[idx] = v
                remaining[0] -= 1
                if remaining[0] == 0:
                    out.resolve(JSArray(results))

            if pe is None:
                on_f(entry)
            else:
                pe.callbacks_append(on_f, out.reject)
        return out

    promise_obj = JSObject({
        "resolve": promise_resolve, "reject": promise_reject,
        "all": promise_all, "__ctor__": promise_ctor,
    }, class_name="PromiseConstructor")
    g.declare("Promise", promise_obj)

    # Errors ----------------------------------------------------------------
    for err_name in ("Error", "TypeError", "RangeError", "SyntaxError"):
        def mk(err_name=err_name):
            @nf(err_name)
            def ctor(i, t, a):
                msg = to_js_string(a[0]) if a and a[0] is not UNDEF else ""
                return make_error(err_name, msg)
            return ctor
        g.declare(err_name, mk())

    # URL / URLSearchParams -------------------------------------------------
    @nf("URL")
    def url_ctor(i, t, a):
        href = to_js_string(a[0])
        if len(a) > 1 and a[1] is not UNDEF:
            href = urllib.parse.urljoin(
                to_js_string(a[1]).rstrip("/") + "/", href)
        return make_url_object(i, href)

    g.declare("URL", url_ctor)

    # timers ----------------------------------------------------------------
    @nf("setTimeout")
    def set_timeout(i, t, a):
        fn = a[0]
        delay = to_number(a[1]) if len(a) > 1 else 0.0
        return i.set_timer(delay, fn, list(a[2:]))

    @nf("clearTimeout")
    def clear_timeout(i, t, a):
        if a and a[0] is not UNDEF:
            i.clear_timer(to_number(a[0]))
        return UNDEF

    g.declare("setTimeout", set_timeout)
    g.declare("clearTimeout", clear_timeout)
    g.declare("setInterval", set_timeout)  # one-shot approximation
    g.declare("clearInterval", clear_timeout)

    # misc ------------------------------------------------------------------
    g.declare("encodeURIComponent", NativeFunction(
        lambda i, t, a: urllib.parse.quote(
            to_js_string(a[0]), safe="!'()*-._~"), "encodeURIComponent"))
    g.declare("decodeURIComponent", NativeFunction(
        lambda i, t, a: urllib.parse.unquote(to_js_string(a[0])),
        "decodeURIComponent"))
    g.declare("parseInt", NativeFunction(
        lambda i, t, a: _parse_int(a), "parseInt"))
    g.declare("parseFloat", NativeFunction(
        lambda i, t, a: _parse_float(a), "parseFloat"))
    g.declare("isNaN", NativeFunction(
        lambda i, t, a: math.isnan(to_number(a[0])), "isNaN"))
    g.declare("NaN", float("nan"))
    g.declare("Infinity", float("inf"))
    g.declare("String", NativeFunction(
        lambda i, t, a: to_js_string(a[0]) if a else "", "String"))
    g.declare("Number", NativeFunction(
        lambda i, t, a: to_number(a[0]) if a else 0.0, "Number"))
    g.declare("Boolean", NativeFunction(
        lambda i, t, a: truthy(a[0]) if a else False, "Boolean"))


def _parse_int(args):
    s = to_js_string(args[0]).strip()
    base = int(to_number(args[1])) if len(args) > 1 and \
        args[1] is not UNDEF else 10
    m = re.match(r"[+-]?[0-9a-zA-Z]+", s)
    if not m:
        return float("nan")
    text = m.group(0)
    try:
        return float(int(text, base))
    except ValueError:
        for end in range(len(text), 0, -1):
            try:
                return float(int(text[:end], base))
            except ValueError:
                continue
        return float("nan")


def _parse_float(args):
    s = to_js_string(args[0]).strip()
    m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    return float(m.group(0)) if m else float("nan")


def make_url_object(interp, href):
    parsed = urllib.parse.urlsplit(href)
    query = dict(urllib.parse.parse_qsl(parsed.query, keep_blank_values=True))
    state = {"parsed": parsed, "query": query}

    def current_href():
        p = state["parsed"]
        q = urllib.parse.urlencode(state["query"])
        return urllib.parse.urlunsplit(
            (p.scheme, p.netloc, p.path, q, p.fragment))

    @nf("set")
    def sp_set(i, t, a):
        state["query"][to_js_string(a[0])] = to_js_string(a[1])
        return UNDEF

    @nf("get")
    def sp_get(i, t, a):
        return state["query"].get(to_js_string(a[0]), None)

    @nf("append")
    def sp_append(i, t, a):
        return sp_set.fn(i, t, a)

    @nf("has")
    def sp_has(i, t, a):
        return to_js_string(a[0]) in state["query"]

    search_params = JSObject({
        "set": sp_set, "get": sp_get, "append": sp_append, "has": sp_has,
    }, class_name="URLSearchParams")

    @nf("toString")
    def to_string(i, t, a):
        return current_href()

    return JSObject({
        "href": href,
        "origin": f"{parsed.scheme}://{parsed.netloc}",
        "protocol": parsed.scheme + ":",
        "hostname": parsed.hostname or "",
        "pathname": parsed.path or "/",
        "searchParams": search_params,
        "toString": to_string,
    }, class_name="URL")
