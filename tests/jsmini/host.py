"""Browser-host fakes for running the extension's JS under jsmini.

Provides what MV3 pages/workers give the extension: ``chrome.storage`` /
``chrome.runtime`` / ``chrome.tabs``, a recording ``fetch``, a minimal DOM
(``document.getElementById`` etc. against elements declared by the test),
``window.location``, and ``importScripts``.  ``ExtensionWorld`` wires a
background-worker interpreter and a page interpreter together through the
same fake chrome so popup/auth flows exercise the real message routing in
``background.js``.
"""

from __future__ import annotations

import json as _json
import os

from tests.jsmini.interp import (
    Interp, JSArray, JSObject, JSPromise, JSThrow, NativeFunction, UNDEF,
    js_to_py, py_to_js, make_error, to_js_string, to_number,
)

EXT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "extension")


def nf(name, fn):
    return NativeFunction(fn, name)


# ---- DOM -------------------------------------------------------------------

class FakeElement:
    """Backs a JSObject so tests can assert on UI state."""

    def __init__(self, elem_id, tag="div"):
        self.id = elem_id
        self.tag = tag
        self.classes = set()
        self.listeners = {}
        self.children = []
        self.obj = JSObject(class_name="HTMLElement")
        p = self.obj.props
        p["id"] = elem_id
        p["textContent"] = ""
        p["className"] = ""
        p["value"] = ""
        p["disabled"] = False
        p["href"] = ""
        p["target"] = ""
        p["rel"] = ""
        p["style"] = JSObject()
        p["classList"] = JSObject({
            "add": nf("add", self._cl_add),
            "remove": nf("remove", self._cl_remove),
            "toggle": nf("toggle", self._cl_toggle),
            "contains": nf("contains", self._cl_contains),
        })
        p["addEventListener"] = nf("addEventListener", self._add_listener)
        p["appendChild"] = nf("appendChild", self._append_child)
        p["__element__"] = self  # backref for test helpers
        p["__onset__"] = nf("__onset__", self._on_prop_set)

    def _on_prop_set(self, interp, this, args):
        # Assigning textContent wipes a real element's children and
        # coerces the value to a string, like the real DOM.
        if to_js_string(args[0]) == "textContent":
            self.children.clear()
            self.obj.props["textContent"] = to_js_string(args[1])
        return UNDEF

    # classList ------------------------------------------------------------
    def _sync_class(self):
        self.obj.props["className"] = " ".join(sorted(self.classes))

    def _cl_add(self, interp, this, args):
        for a in args:
            self.classes.add(to_js_string(a))
        self._sync_class()
        return UNDEF

    def _cl_remove(self, interp, this, args):
        for a in args:
            self.classes.discard(to_js_string(a))
        self._sync_class()
        return UNDEF

    def _cl_toggle(self, interp, this, args):
        name = to_js_string(args[0])
        if len(args) > 1:
            force = bool(args[1])
            (self.classes.add if force else self.classes.discard)(name)
            self._sync_class()
            return force
        if name in self.classes:
            self.classes.discard(name)
            self._sync_class()
            return False
        self.classes.add(name)
        self._sync_class()
        return True

    def _cl_contains(self, interp, this, args):
        return to_js_string(args[0]) in self.classes

    # events / children ------------------------------------------------------
    def _add_listener(self, interp, this, args):
        event = to_js_string(args[0])
        self.listeners.setdefault(event, []).append(args[1])
        return UNDEF

    def _append_child(self, interp, this, args):
        child = args[0]
        self.children.append(child)
        return child

    # test-side helpers ------------------------------------------------------
    @property
    def text(self):
        return self.obj.props.get("textContent", "")

    @property
    def hidden(self):
        return "hidden" in self.classes

    def fire(self, interp, event, event_obj=None):
        """Dispatch an event to this element's listeners (drains the loop)."""
        ev = event_obj or JSObject({
            "preventDefault": nf("preventDefault",
                                 lambda i, t, a: UNDEF),
            "type": event,
        })
        for fn in self.listeners.get(event, []):
            result = interp.call(fn, [ev])
            interp.await_settled(result)
        interp.drain()


class FakeDocument:
    def __init__(self):
        self.elements = {}
        self.query_results = {}  # selector -> element or None

    def ensure(self, elem_id, tag="div"):
        if elem_id not in self.elements:
            self.elements[elem_id] = FakeElement(elem_id, tag)
        return self.elements[elem_id]

    def load_html(self, path):
        """Seed elements (id, tag, class, disabled, value, text) from the
        page's real markup so initial UI state matches the extension."""
        from html.parser import HTMLParser

        doc = self

        class Scanner(HTMLParser):
            def __init__(self):
                super().__init__()
                self.open_el = None

            def handle_starttag(self, tag, attrs):
                attrs = dict(attrs)
                elem_id = attrs.get("id")
                if elem_id is None:
                    self.open_el = None
                    return
                el = doc.ensure(elem_id, tag)
                for cls in (attrs.get("class") or "").split():
                    el.classes.add(cls)
                el._sync_class()
                if "disabled" in attrs:
                    el.obj.props["disabled"] = True
                if "value" in attrs:
                    el.obj.props["value"] = attrs["value"]
                if "href" in attrs:
                    el.obj.props["href"] = attrs["href"]
                self.open_el = el

            def handle_data(self, data):
                if self.open_el is not None and data.strip():
                    self.open_el.obj.props["textContent"] = \
                        (self.open_el.obj.props.get("textContent") or "") \
                        + data.strip()

            def handle_endtag(self, tag):
                self.open_el = None

        with open(path, "r", encoding="utf-8") as f:
            Scanner().feed(f.read())

    def install(self, interp, env=None):
        env = env or interp.genv
        doc = JSObject(class_name="Document")

        def get_by_id(i, t, a):
            return self.ensure(to_js_string(a[0])).obj

        def create_element(i, t, a):
            return FakeElement(None, to_js_string(a[0])).obj

        def query_selector(i, t, a):
            sel = to_js_string(a[0])
            el = self.query_results.get(sel)
            return el.obj if isinstance(el, FakeElement) else (
                el if el is not None else None)

        doc.props["getElementById"] = nf("getElementById", get_by_id)
        doc.props["createElement"] = nf("createElement", create_element)
        doc.props["querySelector"] = nf("querySelector", query_selector)
        doc.props["addEventListener"] = nf(
            "addEventListener", lambda i, t, a: UNDEF)
        env.declare("document", doc)
        return doc


# ---- location / window -----------------------------------------------------

class FakeLocation:
    def __init__(self, href="chrome-extension://ext/popup.html"):
        self.href = href
        self.navigations = []
        self.obj = JSObject(class_name="Location")
        self._refresh()
        self.obj.props["__set__"] = NativeFunction(self._on_set, "__set__")

    def _refresh(self):
        from urllib.parse import urlsplit
        parts = urlsplit(self.href)
        p = self.obj.props
        p.pop("__set__", None)
        p["href"] = self.href
        p["hostname"] = parts.hostname or ""
        p["pathname"] = parts.path or "/"
        p["protocol"] = (parts.scheme + ":") if parts.scheme else ""
        p["__set__"] = NativeFunction(self._on_set, "__set__")

    def _on_set(self, interp, this, args):
        key, value = to_js_string(args[0]), args[1]
        if key == "href":
            self.href = to_js_string(value)
            self.navigations.append(self.href)
            self._refresh()
        else:
            self.obj.props[key] = value
        return UNDEF


def install_window(interp, location, env=None):
    env = env or interp.genv
    win = JSObject(class_name="Window")
    win.props["location"] = location.obj
    env.declare("window", win)
    env.declare("self", win)
    env.declare("globalThis", win)
    return win


# ---- fetch -----------------------------------------------------------------

class FakeFetch:
    """Recording fetch.  Route table maps (method, url-predicate) to a
    responder; falls back to an optional live HTTP transport."""

    def __init__(self):
        self.calls = []  # dicts: method,url,headers,body(py)
        self.routes = []  # (matcher(method,url) -> bool, responder)
        self.live_base = None  # e.g. "http://127.0.0.1:PORT" to really POST

    def route(self, method, url_substr, responder):
        """responder: callable(call_dict) -> (status, py_body) or the pair
        itself."""
        self.routes.append((method.upper(), url_substr, responder))

    def install(self, interp, env=None):
        env = env or interp.genv
        env.declare("fetch", NativeFunction(self._fetch, "fetch"))

    def _fetch(self, interp, this, args):
        url = to_js_string(args[0])
        opts = args[1] if len(args) > 1 and isinstance(args[1], JSObject) \
            else JSObject()
        method = to_js_string(opts.props.get("method", "GET")).upper()
        headers = js_to_py(opts.props.get("headers", JSObject())) or {}
        body_raw = opts.props.get("body", UNDEF)
        body = None
        if isinstance(body_raw, str):
            try:
                body = _json.loads(body_raw)
            except ValueError:
                body = body_raw
        call = {"method": method, "url": url, "headers": headers,
                "body": body}
        self.calls.append(call)

        p = JSPromise(interp)
        try:
            status, payload = self._respond(call)
        except ConnectionError as e:
            p.reject(make_error("TypeError", f"Failed to fetch: {e}"))
            return p
        resp = self._make_response(interp, status, payload)
        p.resolve(resp)
        return p

    def _respond(self, call):
        for method, url_substr, responder in self.routes:
            if call["method"] == method and url_substr in call["url"]:
                out = responder(call) if callable(responder) else responder
                return out
        if self.live_base is not None:
            return self._live(call)
        raise ConnectionError(f"no route for {call['method']} {call['url']}")

    def _live(self, call):
        import urllib.request
        import urllib.error
        from urllib.parse import urlsplit, urlunsplit
        parts = urlsplit(call["url"])
        base = urlsplit(self.live_base)
        url = urlunsplit((base.scheme, base.netloc, parts.path,
                          parts.query, ""))
        data = None
        headers = {k: v for k, v in call["headers"].items()}
        if call["body"] is not None:
            data = _json.dumps(call["body"]).encode() \
                if not isinstance(call["body"], str) \
                else call["body"].encode()
            headers.setdefault("Content-Type", "application/json")
        req = urllib.request.Request(url, data=data, headers=headers,
                                     method=call["method"])
        try:
            # Generous timeout: the live-server tests run a real analysis
            # on this container's single CPU core, where a concurrent
            # pytest process can stretch a ~5 s request past 30 s.
            with urllib.request.urlopen(req, timeout=180) as resp:
                return resp.status, _json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            try:
                return e.code, _json.loads(e.read().decode())
            except ValueError:
                return e.code, {}

    @staticmethod
    def _make_response(interp, status, payload):
        def json_method(i, t, a):
            pr = JSPromise(i)
            if isinstance(payload, Exception):
                pr.reject(make_error("SyntaxError", str(payload)))
            else:
                pr.resolve(py_to_js(payload))
            return pr

        def text_method(i, t, a):
            pr = JSPromise(i)
            pr.resolve(payload if isinstance(payload, str)
                       else _json.dumps(payload))
            return pr

        return JSObject({
            "ok": 200 <= status < 300,
            "status": float(status),
            "json": nf("json", json_method),
            "text": nf("text", text_method),
        }, class_name="Response")


# ---- chrome ----------------------------------------------------------------

class FakeChrome:
    """One chrome.* instance shared between the background worker and any
    page interpreters, so sendMessage really routes through the worker's
    onMessage listener."""

    def __init__(self):
        self.storage = {}  # chrome.storage.local backing dict (py values)
        self.message_listeners = []  # (interp, fn) of background listeners
        self.tabs = []  # list of {"id": .., "url": .., "active": True}
        self.tab_message_handler = None  # callable(tab_id, py_msg) -> py resp
        self.sent_messages = []  # record of runtime.sendMessage payloads

    # -- building the chrome object per interpreter --

    def install(self, interp, env=None, is_background=False):
        env = env or interp.genv
        chrome = JSObject(class_name="Chrome")
        chrome.props["storage"] = JSObject({
            "local": JSObject({
                "get": nf("get", self._storage_get),
                "set": nf("set", self._storage_set),
                "remove": nf("remove", self._storage_remove),
            })
        })
        on_message = JSObject({
            "addListener": nf(
                "addListener",
                lambda i, t, a: self._add_listener(i, a[0])),
        })
        chrome.props["runtime"] = JSObject({
            "onMessage": on_message,
            "sendMessage": nf("sendMessage", self._runtime_send),
            "lastError": None,
        })
        chrome.props["tabs"] = JSObject({
            "query": nf("query", self._tabs_query),
            "sendMessage": nf("sendMessage", self._tabs_send),
        })
        env.declare("chrome", chrome)
        return chrome

    # -- storage --

    def _storage_get(self, interp, this, args):
        keys = args[0] if args else UNDEF
        out = {}
        if isinstance(keys, str):
            names = [keys]
        elif isinstance(keys, JSArray):
            names = [to_js_string(k) for k in keys.items]
        else:
            names = list(self.storage)
        for name in names:
            if name in self.storage:
                out[name] = self.storage[name]
        p = JSPromise(interp)
        p.resolve(py_to_js(out))
        # Callback style also supported.
        if len(args) > 1 and args[1] is not UNDEF:
            interp.microtasks.append(
                lambda: interp.call(args[1], [py_to_js(out)]))
        return p

    def _storage_set(self, interp, this, args):
        obj = args[0]
        if isinstance(obj, JSObject):
            for k, v in obj.props.items():
                self.storage[k] = js_to_py(v)
        p = JSPromise(interp)
        p.resolve(UNDEF)
        return p

    def _storage_remove(self, interp, this, args):
        keys = args[0]
        names = [to_js_string(keys)] if isinstance(keys, str) else [
            to_js_string(k) for k in keys.items]
        for name in names:
            self.storage.pop(name, None)
        p = JSPromise(interp)
        p.resolve(UNDEF)
        return p

    # -- messaging --

    def _add_listener(self, interp, fn):
        self.message_listeners.append((interp, fn))
        return UNDEF

    def _runtime_send(self, interp, this, args):
        """chrome.runtime.sendMessage(message, callback?) from a page: route
        synchronously-via-microtask to background listeners."""
        message = args[0]
        callback = args[1] if len(args) > 1 else None
        self.sent_messages.append(js_to_py(message))

        responded = {"done": False}

        def send_response_native(i, t, a):
            if responded["done"]:
                return UNDEF
            responded["done"] = True
            if callback is not None and callback is not UNDEF:
                resp = a[0] if a else UNDEF
                interp.microtasks.append(
                    lambda: interp.call(callback, [resp]))
            return UNDEF

        def deliver():
            sender = JSObject({"id": "jsmini-ext"})
            for bg_interp, fn in self.message_listeners:
                # The background's payload is the same JS value graph —
                # both interpreters share value classes, so no copying.
                bg_interp.call(fn, [
                    message, sender,
                    NativeFunction(send_response_native, "sendResponse")])

        interp.microtasks.append(deliver)
        return UNDEF

    def _tabs_query(self, interp, this, args):
        p = JSPromise(interp)
        p.resolve(py_to_js([t for t in self.tabs if t.get("active")]))
        return p

    def _tabs_send(self, interp, this, args):
        tab_id = to_number(args[0])
        message = js_to_py(args[1])
        p = JSPromise(interp)
        if self.tab_message_handler is None:
            p.reject(make_error(
                "Error", "Could not establish connection. Receiving end "
                "does not exist."))
        else:
            try:
                p.resolve(py_to_js(self.tab_message_handler(tab_id,
                                                            message)))
            except Exception as e:
                p.reject(make_error("Error", str(e)))
        return p


# ---- worlds ----------------------------------------------------------------

class BackgroundWorld:
    """background.js loaded in a service-worker-like interpreter."""

    def __init__(self, chrome=None, fetch=None, config=None, loop=None):
        self.interp = Interp(loop=loop)
        self.loop = self.interp.loop
        self.chrome = chrome or FakeChrome()
        self.fetch = fetch or FakeFetch()
        self.config = config
        self.chrome.install(self.interp, is_background=True)
        self.fetch.install(self.interp)
        win = JSObject(class_name="WorkerGlobalScope")
        self.interp.genv.declare("self", win)

        def import_scripts(i, t, a):
            name = to_js_string(a[0])
            if name == "config.js" and self.config is not None:
                win.props["TRUELY_CONFIG"] = py_to_js(self.config)
                return UNDEF
            if name == "config.js":
                raise JSThrow(make_error("Error", "config.js not found"))
            raise JSThrow(make_error("Error", f"no such script {name}"))

        self.interp.genv.declare(
            "importScripts", NativeFunction(import_scripts, "importScripts"))
        self.interp.run_file(os.path.join(EXT_DIR, "background.js"))

    def send(self, message_py, timeout_steps=100000):
        """Deliver a message as the popup would; returns the py response."""
        interp = self.interp
        result = {}

        def callback(i, t, a):
            result["resp"] = js_to_py(a[0] if a else UNDEF)
            return UNDEF

        self.chrome._runtime_send(
            interp, UNDEF,
            [py_to_js(message_py), NativeFunction(callback, "cb")])
        steps = 0
        while "resp" not in result:
            if not interp.tick():
                raise AssertionError(
                    f"background never responded to {message_py!r}")
            steps += 1
            if steps > timeout_steps:
                raise AssertionError("background response timed out")
        return result["resp"]


class PageWorld:
    """A popup/auth page interpreter wired to a shared chrome + fetch."""

    def __init__(self, chrome, fetch=None, href="chrome-extension://e/x.html",
                 scripts=(), dom_ids=(), loop=None, html=None):
        self.interp = Interp(loop=loop)
        self.chrome = chrome
        self.fetch = fetch
        self.document = FakeDocument()
        self.location = FakeLocation(href)
        if html is not None:
            self.document.load_html(os.path.join(EXT_DIR, html))
        for elem_id in dom_ids:
            self.document.ensure(elem_id)
        self.document.install(self.interp)
        install_window(self.interp, self.location)
        chrome.install(self.interp)
        if fetch is not None:
            fetch.install(self.interp)
        for script in scripts:
            self.interp.run_file(os.path.join(EXT_DIR, script))
        self.interp.drain()

    def el(self, elem_id) -> FakeElement:
        return self.document.ensure(elem_id)

    def click(self, elem_id):
        self.el(elem_id).fire(self.interp, "click")

    def submit(self, elem_id):
        self.el(elem_id).fire(self.interp, "submit")
