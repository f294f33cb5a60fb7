"""Tree-walking evaluator for the jsmini JS subset.

Event-loop model: promises + virtual-time timers.  ``await`` drains the
microtask/timer queues until its promise settles (async bodies therefore
run synchronously from the caller's perspective — adequate for the
extension's sequential flows, and it keeps the interpreter small).
"""

from __future__ import annotations

import heapq
import json as _json
import math
import re
from collections import deque


# ---- values ----------------------------------------------------------------

class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()


class JSObject:
    def __init__(self, props=None, class_name="Object"):
        self.props = dict(props or {})
        self.class_name = class_name

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"JSObject({self.props!r})"


class JSArray:
    def __init__(self, items=None):
        self.items = list(items or [])

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"JSArray({self.items!r})"


class JSRegExp:
    def __init__(self, source, flags):
        self.source = source
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= re.IGNORECASE
        if "s" in flags:
            py_flags |= re.DOTALL
        if "m" in flags:
            py_flags |= re.MULTILINE
        self.rx = re.compile(_js_regex_to_py(source), py_flags)
        self.global_ = "g" in flags


def _js_regex_to_py(src):
    # The dialects agree on everything the extension uses; translate the
    # couple of JS-isms Python's re rejects.
    return src.replace(r"\/", "/")


class JSFunction:
    def __init__(self, name, params, body, env, is_async, is_arrow,
                 captured_this=UNDEF):
        self.name = name or ""
        self.params = params
        self.body = body
        self.env = env
        self.is_async = is_async
        self.is_arrow = is_arrow
        self.captured_this = captured_this


class NativeFunction:
    def __init__(self, fn, name=""):
        self.fn = fn  # fn(interp, this, args) -> value
        self.name = name or getattr(fn, "__name__", "")


class JSPromise:
    def __init__(self, interp):
        self.interp = interp
        self.state = "pending"
        self.value = UNDEF
        self.callbacks = []  # (on_fulfilled|None, on_rejected|None, next)

    def _settle(self, state, value):
        if self.state != "pending":
            return
        self.state = state
        self.value = value
        for cb in self.callbacks:
            self._schedule(cb)
        self.callbacks = []

    def resolve(self, value):
        if isinstance(value, JSPromise):
            value.callbacks_append(
                lambda v: self._settle("fulfilled", v),
                lambda e: self._settle("rejected", e))
            return
        self._settle("fulfilled", value)

    def reject(self, value):
        self._settle("rejected", value)

    def callbacks_append(self, on_f, on_r):
        """Internal adoption (no result promise)."""
        if self.state == "fulfilled":
            self.interp.microtasks.append(lambda: on_f(self.value))
        elif self.state == "rejected":
            self.interp.microtasks.append(lambda: on_r(self.value))
        else:
            self.callbacks.append((on_f, on_r, None))

    def then(self, on_fulfilled=None, on_rejected=None):
        nxt = JSPromise(self.interp)
        entry = (on_fulfilled, on_rejected, nxt)
        if self.state == "pending":
            self.callbacks.append(entry)
        else:
            self._schedule(entry)
        return nxt

    def _schedule(self, entry):
        on_f, on_r, nxt = entry
        state, value, interp = self.state, self.value, self.interp

        def run():
            if nxt is None:
                (on_f if state == "fulfilled" else on_r)(value)
                return
            handler = on_f if state == "fulfilled" else on_r
            if handler is None or handler is UNDEF:
                # Pass through.
                (nxt.resolve if state == "fulfilled" else nxt.reject)(value)
                return
            try:
                nxt.resolve(interp.call(handler, [value]))
            except JSThrow as e:
                nxt.reject(e.value)

        interp.microtasks.append(run)


class JSThrow(Exception):
    def __init__(self, value):
        self.value = value
        super().__init__(js_error_message(value))


def js_error_message(value):
    if isinstance(value, JSObject):
        msg = value.props.get("message")
        if isinstance(msg, str):
            return f"{value.class_name}: {msg}"
    return to_js_string(value)


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


# ---- conversions -----------------------------------------------------------

def num_to_str(v):
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return repr(v)


def to_js_string(v):
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return num_to_str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, JSArray):
        return ",".join("" if x is None or x is UNDEF else to_js_string(x)
                        for x in v.items)
    if isinstance(v, JSObject):
        if v.class_name != "Object":
            msg = v.props.get("message", "")
            return (f"{v.class_name}: {to_js_string(msg)}"
                    if msg else v.class_name)
        return "[object Object]"
    if isinstance(v, (JSFunction, NativeFunction)):
        return f"function {v.name}() {{ [code] }}"
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    if isinstance(v, JSPromise):
        return "[object Promise]"
    return str(v)


def to_number(v):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s[:2].lower() == "0x" else float(s)
        except ValueError:
            return float("nan")
    return float("nan")


def truthy(v):
    if v is UNDEF or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and not (isinstance(v, float) and math.isnan(v))
    if isinstance(v, str):
        return len(v) > 0
    return True


def strict_eq(a, b):
    if a is UNDEF or b is UNDEF:
        return a is b
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def loose_eq(a, b):
    if (a is None or a is UNDEF) and (b is None or b is UNDEF):
        return True
    if isinstance(a, str) and isinstance(b, (int, float)) \
            and not isinstance(b, bool):
        return to_number(a) == b
    if isinstance(b, str) and isinstance(a, (int, float)) \
            and not isinstance(a, bool):
        return to_number(b) == a
    return strict_eq(a, b)


def py_to_js(v):
    """Convert plain Python data into jsmini values."""
    if isinstance(v, dict):
        return JSObject({k: py_to_js(x) for k, x in v.items()})
    if isinstance(v, (list, tuple)):
        return JSArray([py_to_js(x) for x in v])
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def js_to_py(v):
    """Convert jsmini values back into plain Python data (for asserts)."""
    if isinstance(v, JSObject):
        return {k: js_to_py(x) for k, x in v.props.items()}
    if isinstance(v, JSArray):
        return [js_to_py(x) for x in v.items]
    if v is UNDEF:
        return None
    if isinstance(v, float) and v == int(v) and not math.isinf(v):
        return int(v)
    return v


# ---- environment -----------------------------------------------------------

class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise JSThrow(make_error("ReferenceError",
                                 f"{name} is not defined"))

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        # Implicit global (sloppy mode), matches browser behavior.
        g = self
        while g.parent is not None:
            g = g.parent
        g.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value

    def has(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return True
            e = e.parent
        return False


def make_error(class_name, message):
    return JSObject({"message": message, "stack": f"{class_name}: {message}"},
                    class_name=class_name)


# ---- interpreter -----------------------------------------------------------

class EventLoop:
    """Microtasks + virtual-time timers.  Shareable between interpreters
    (e.g. a background worker and a popup page in one test)."""

    def __init__(self):
        self.microtasks = deque()
        self.timers = []  # heap of (fire_at_ms, seq, callback, args)
        self.timer_seq = 0
        self.vclock = 1755400000000.0  # virtual Date.now() origin (ms)


class Interp:
    def __init__(self, loop=None):
        self.genv = Env()
        self.loop = loop or EventLoop()
        self.console = []  # (level, rendered message)
        install_builtins(self)

    @property
    def microtasks(self):
        return self.loop.microtasks

    @property
    def timers(self):
        return self.loop.timers

    @property
    def vclock(self):
        return self.loop.vclock

    @vclock.setter
    def vclock(self, v):
        self.loop.vclock = v

    # -- public API --

    def run(self, src, env=None):
        from tests.jsmini.parser import parse
        prog = parse(src)
        env = env or self.genv
        self.hoist(prog, env)
        return self.exec_block(prog, env, this=UNDEF)

    def run_file(self, path, env=None):
        with open(path, "r", encoding="utf-8") as f:
            return self.run(f.read(), env=env)

    def call(self, fn, args, this=UNDEF):
        if isinstance(fn, NativeFunction):
            return fn.fn(self, this, list(args))
        if not isinstance(fn, JSFunction):
            raise JSThrow(make_error(
                "TypeError", f"{to_js_string(fn)} is not a function"))
        env = Env(fn.env)
        self.bind_params(fn.params, list(args), env)
        use_this = fn.captured_this if fn.is_arrow else this
        if fn.is_async:
            p = JSPromise(self)
            try:
                p.resolve(self._run_body(fn, env, use_this))
            except JSThrow as e:
                p.reject(e.value)
            return p
        return self._run_body(fn, env, use_this)

    def _run_body(self, fn, env, this):
        try:
            self.hoist(fn.body, env)
            self.exec_block(fn.body, env, this)
        except _Return as r:
            return r.value
        return UNDEF

    # -- event loop --

    def run_microtasks(self):
        while self.microtasks:
            self.microtasks.popleft()()

    def set_timer(self, delay_ms, callback, args=()):
        self.loop.timer_seq += 1
        heapq.heappush(self.timers,
                       (self.vclock + max(0.0, delay_ms),
                        self.loop.timer_seq, callback, tuple(args)))
        return float(self.loop.timer_seq)

    def clear_timer(self, timer_id):
        kept = [t for t in self.timers if t[1] != int(timer_id)]
        self.timers[:] = kept
        heapq.heapify(self.timers)

    def tick(self):
        """Run one unit of event-loop work.  Returns False when idle."""
        if self.microtasks:
            self.microtasks.popleft()()
            return True
        if self.timers:
            fire_at, _, cb, args = heapq.heappop(self.timers)
            self.vclock = max(self.vclock, fire_at)
            cb(*args) if not isinstance(cb, (JSFunction, NativeFunction)) \
                else self.call(cb, list(args))
            return True
        return False

    def drain(self, max_steps=100000):
        steps = 0
        while self.tick():
            steps += 1
            if steps > max_steps:
                raise RuntimeError("jsmini event loop did not quiesce")

    def await_promise(self, p):
        if not isinstance(p, JSPromise):
            return p
        steps = 0
        while p.state == "pending":
            if not self.tick():
                raise RuntimeError(
                    "await deadlock: promise pending with idle event loop")
            steps += 1
            if steps > 100000:
                raise RuntimeError("await did not settle in 100k steps")
        if p.state == "rejected":
            err = p.value
            raise JSThrow(err)
        return p.value

    def await_settled(self, v):
        """Host helper: block on a value that may be a promise."""
        if isinstance(v, JSPromise):
            return self.await_promise(v)
        return v

    # -- declarations/hoisting --

    def hoist(self, block, env):
        for stmt in block[1]:
            if stmt[0] == "funcdecl":
                fn = stmt[1]
                env.declare(fn[1], self.make_function(fn, env, UNDEF))
            elif stmt[0] == "var" and stmt[1] == "var":
                for pat, _ in stmt[2]:
                    for name in pattern_names(pat):
                        if name not in env.vars:
                            env.declare(name, UNDEF)

    def make_function(self, node, env, this):
        _, name, params, body, is_async, is_arrow = node
        return JSFunction(name, params, body, env, is_async, is_arrow,
                          captured_this=this if is_arrow else UNDEF)

    def bind_params(self, params, args, env):
        i = 0
        for p in params:
            if p[0] == "prest":
                env.declare(p[1], JSArray(args[i:]))
                return
            v = args[i] if i < len(args) else UNDEF
            self.bind_pattern(p, v, env)
            i += 1

    def bind_pattern(self, pat, value, env):
        kind = pat[0]
        if kind == "pdefault":
            if value is UNDEF:
                value = self.eval(pat[2], env, UNDEF)
            self.bind_pattern(pat[1], value, env)
        elif kind == "pid":
            if value is UNDEF and pat[2] is not None:
                value = self.eval(pat[2], env, UNDEF)
            env.declare(pat[1], value)
        elif kind == "pobj":
            if value is None or value is UNDEF:
                raise JSThrow(make_error(
                    "TypeError",
                    f"cannot destructure {to_js_string(value)}"))
            taken = set()
            for key, sub in pat[1]:
                taken.add(key)
                self.bind_pattern(sub, self.get_prop(value, key), env)
            if pat[2]:
                rest = JSObject()
                if isinstance(value, JSObject):
                    for k, v in value.props.items():
                        if k not in taken:
                            rest.props[k] = v
                env.declare(pat[2], rest)
        elif kind == "parr":
            items = self.iterate(value)
            for idx, sub in enumerate(pat[1]):
                if sub is None:
                    continue
                v = items[idx] if idx < len(items) else UNDEF
                self.bind_pattern(sub, v, env)
        else:  # pragma: no cover
            raise RuntimeError(f"bad pattern {pat!r}")

    def iterate(self, value):
        if isinstance(value, JSArray):
            return list(value.items)
        if isinstance(value, str):
            return list(value)
        if isinstance(value, JSObject):
            it = value.props.get("__iter__")
            if it is not None:
                return list(it)
        raise JSThrow(make_error("TypeError",
                                 f"{to_js_string(value)} is not iterable"))

    # -- statements --

    def exec_block(self, block, env, this):
        for stmt in block[1]:
            self.exec_stmt(stmt, env, this)
        return UNDEF

    def exec_stmt(self, stmt, env, this):
        kind = stmt[0]
        if kind == "expr":
            self.eval(stmt[1], env, this)
        elif kind == "var":
            for pat, init in stmt[2]:
                value = UNDEF if init is None else self.eval(init, env, this)
                self.bind_pattern(pat, value, env)
        elif kind == "funcdecl":
            pass  # hoisted
        elif kind == "if":
            if truthy(self.eval(stmt[1], env, this)):
                self.exec_stmt(stmt[2], env, this)
            elif stmt[3] is not None:
                self.exec_stmt(stmt[3], env, this)
        elif kind == "block":
            inner = Env(env)
            self.hoist(stmt, inner)
            self.exec_block(stmt, inner, this)
        elif kind == "return":
            raise _Return(UNDEF if stmt[1] is None
                          else self.eval(stmt[1], env, this))
        elif kind == "throw":
            raise JSThrow(self.eval(stmt[1], env, this))
        elif kind == "while":
            while truthy(self.eval(stmt[1], env, this)):
                try:
                    self.exec_stmt(stmt[2], env, this)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "for":
            init, test, update, body = stmt[1:]
            loop_env = Env(env)
            if init is not None:
                self.exec_stmt(init, loop_env, this)
            while test is None or truthy(self.eval(test, loop_env, this)):
                try:
                    self.exec_stmt(body, loop_env, this)
                except _Break:
                    break
                except _Continue:
                    pass
                if update is not None:
                    self.eval(update, loop_env, this)
        elif kind == "forof":
            _, decl_kind, pat, iterable, body = stmt
            for item in self.iterate(self.eval(iterable, env, this)):
                iter_env = Env(env)
                self.bind_pattern(pat, item, iter_env)
                try:
                    self.exec_stmt(body, iter_env, this)
                except _Break:
                    break
                except _Continue:
                    continue
        elif kind == "try":
            _, block, catch_param, catch_block, finally_block = stmt
            try:
                inner = Env(env)
                self.hoist(block, inner)
                self.exec_block(block, inner, this)
            except JSThrow as e:
                if catch_block is not None:
                    cenv = Env(env)
                    if catch_param is not None:
                        self.bind_pattern(catch_param, e.value, cenv)
                    self.hoist(catch_block, cenv)
                    self.exec_block(catch_block, cenv, this)
                else:
                    raise
            finally:
                if finally_block is not None:
                    fenv = Env(env)
                    self.hoist(finally_block, fenv)
                    self.exec_block(finally_block, fenv, this)
        elif kind == "break":
            raise _Break()
        elif kind == "continue":
            raise _Continue()
        elif kind == "empty":
            pass
        else:  # pragma: no cover
            raise RuntimeError(f"bad statement {kind!r}")

    # -- expressions --

    def eval(self, node, env, this):
        kind = node[0]
        if kind == "num":
            return node[1]
        if kind == "str":
            return node[1]
        if kind == "lit":
            v = node[1]
            return UNDEF if v == ("undefined",) else v
        if kind == "ident":
            return env.lookup(node[1])
        if kind == "this":
            return this
        if kind == "tpl":
            chunks, exprs = node[1], node[2]
            out = [chunks[0]]
            for e, chunk in zip(exprs, chunks[1:]):
                out.append(to_js_string(self.eval(e, env, this)))
                out.append(chunk)
            return "".join(out)
        if kind == "regexlit":
            return JSRegExp(node[1], node[2])
        if kind == "array":
            items = []
            for e in node[1]:
                if e[0] == "spread":
                    items.extend(self.iterate(self.eval(e[1], env, this)))
                else:
                    items.append(self.eval(e, env, this))
            return JSArray(items)
        if kind == "object":
            obj = JSObject()
            for prop in node[1]:
                if prop[0] == "spread":
                    src = self.eval(prop[1], env, this)
                    if isinstance(src, JSObject):
                        obj.props.update(src.props)
                    elif isinstance(src, JSArray):
                        for i, v in enumerate(src.items):
                            obj.props[str(i)] = v
                elif prop[0] == "computed":
                    key = to_js_string(self.eval(prop[1], env, this))
                    obj.props[key] = self.eval(prop[2], env, this)
                else:
                    _, key, value_node = prop
                    obj.props[key] = self.eval(value_node, env, this)
            return obj
        if kind == "func":
            return self.make_function(node, env, this)
        if kind == "unary":
            return self.eval_unary(node, env, this)
        if kind == "update":
            return self.eval_update(node, env, this)
        if kind == "binary":
            return self.eval_binary(
                node[1], self.eval(node[2], env, this),
                self.eval(node[3], env, this))
        if kind == "logical":
            left = self.eval(node[2], env, this)
            op = node[1]
            if op == "&&":
                return self.eval(node[3], env, this) if truthy(left) else left
            if op == "||":
                return left if truthy(left) else self.eval(node[3], env, this)
            # ??
            if left is None or left is UNDEF:
                return self.eval(node[3], env, this)
            return left
        if kind == "ternary":
            cond = self.eval(node[1], env, this)
            return self.eval(node[2] if truthy(cond) else node[3], env, this)
        if kind == "assign":
            return self.eval_assign(node, env, this)
        if kind == "member":
            obj = self.eval(node[1], env, this)
            if node[4] and (obj is None or obj is UNDEF):  # optional ?.
                return UNDEF
            key = node[2][1] if not node[3] else to_js_string(
                self.eval(node[2], env, this))
            return self.get_prop(obj, key)
        if kind == "call":
            return self.eval_call(node, env, this)
        if kind == "new":
            callee = self.eval(node[1], env, this)
            args = self.eval_args(node[2], env, this)
            if isinstance(callee, JSObject) and "__ctor__" in callee.props:
                return self.call(callee.props["__ctor__"], args)
            if isinstance(callee, NativeFunction):
                return callee.fn(self, "__new__", args)
            raise JSThrow(make_error("TypeError",
                                     "constructor is not supported"))
        if kind == "await":
            value = self.eval(node[1], env, this)
            return self.await_promise(value)
        if kind == "spread":  # pragma: no cover - handled by containers
            raise RuntimeError("spread outside container")
        raise RuntimeError(f"bad expression {kind!r}")  # pragma: no cover

    def eval_args(self, arg_nodes, env, this):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(self.iterate(self.eval(a[1], env, this)))
            else:
                args.append(self.eval(a, env, this))
        return args

    def eval_call(self, node, env, this):
        _, callee, arg_nodes, optional = node
        if callee[0] == "member":
            obj = self.eval(callee[1], env, this)
            if callee[4] and (obj is None or obj is UNDEF):
                return UNDEF
            key = callee[2][1] if not callee[3] else to_js_string(
                self.eval(callee[2], env, this))
            fn = self.get_prop(obj, key)
            if optional and (fn is None or fn is UNDEF):
                return UNDEF
            if fn is UNDEF or fn is None:
                raise JSThrow(make_error(
                    "TypeError",
                    f"{to_js_string(obj)[:40]}.{key} is not a function"))
            return self.call(fn, self.eval_args(arg_nodes, env, this),
                             this=obj)
        fn = self.eval(callee, env, this)
        if optional and (fn is None or fn is UNDEF):
            return UNDEF
        return self.call(fn, self.eval_args(arg_nodes, env, this))

    def eval_unary(self, node, env, this):
        op = node[1]
        if op == "typeof":
            target = node[2]
            if target[0] == "ident" and not env.has(target[1]):
                return "undefined"
            v = self.eval(target, env, this)
            if v is UNDEF:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, (JSFunction, NativeFunction)):
                return "function"
            return "object"
        if op == "delete":
            target = node[2]
            if target[0] == "member":
                obj = self.eval(target[1], env, this)
                key = target[2][1] if not target[3] else to_js_string(
                    self.eval(target[2], env, this))
                if isinstance(obj, JSObject):
                    obj.props.pop(key, None)
            return True
        v = self.eval(node[2], env, this)
        if op == "!":
            return not truthy(v)
        if op == "-":
            return -to_number(v)
        if op == "+":
            return to_number(v)
        if op == "~":
            return float(~int(to_number(v)))
        if op == "void":
            return UNDEF
        raise RuntimeError(f"bad unary {op!r}")  # pragma: no cover

    def eval_update(self, node, env, this):
        _, op, prefix, target = node
        old = to_number(self.eval(target, env, this))
        new = old + (1 if op == "++" else -1)
        self.assign_to(target, new, env, this)
        return new if prefix else old

    def eval_binary(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) or \
                    isinstance(a, (JSArray, JSObject)) or \
                    isinstance(b, (JSArray, JSObject)):
                return to_js_string(a) + to_js_string(b)
            return to_number(a) + to_number(b)
        if op == "-":
            return to_number(a) - to_number(b)
        if op == "*":
            return to_number(a) * to_number(b)
        if op == "/":
            bn = to_number(b)
            an = to_number(a)
            if bn == 0:
                if an == 0 or math.isnan(an):
                    return float("nan")
                return math.copysign(float("inf"), an) * math.copysign(1, bn)
            return an / bn
        if op == "%":
            bn = to_number(b)
            an = to_number(a)
            if bn == 0 or math.isnan(an) or math.isinf(an):
                return float("nan")
            return math.fmod(an, bn)
        if op == "**":
            return to_number(a) ** to_number(b)
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op == "==":
            return loose_eq(a, b)
        if op == "!=":
            return not loose_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b,
                        "<=": a <= b, ">=": a >= b}[op]
            an, bn = to_number(a), to_number(b)
            if math.isnan(an) or math.isnan(bn):
                return False
            return {"<": an < bn, ">": an > bn,
                    "<=": an <= bn, ">=": an >= bn}[op]
        if op in ("&", "|", "^", "<<", ">>"):
            ai, bi = int(to_number(a)), int(to_number(b))
            return float({"&": ai & bi, "|": ai | bi, "^": ai ^ bi,
                          "<<": ai << bi, ">>": ai >> bi}[op])
        if op == "instanceof":
            if isinstance(b, NativeFunction):
                if b.name == "Error":
                    return isinstance(a, JSObject) and \
                        a.class_name.endswith("Error")
                if b.name == "Promise":
                    return isinstance(a, JSPromise)
                if b.name == "Array":
                    return isinstance(a, JSArray)
            return False
        if op == "in":
            if isinstance(b, JSObject):
                return to_js_string(a) in b.props
            if isinstance(b, JSArray):
                idx = to_number(a)
                return 0 <= idx < len(b.items)
            return False
        raise RuntimeError(f"bad binary {op!r}")  # pragma: no cover

    def eval_assign(self, node, env, this):
        _, op, target, value_node = node
        if op == "=":
            value = self.eval(value_node, env, this)
            self.assign_to(target, value, env, this)
            return value
        if op in ("&&=", "||=", "??="):
            cur = self.eval(target, env, this)
            need = (truthy(cur) if op == "&&=" else
                    not truthy(cur) if op == "||=" else
                    cur is None or cur is UNDEF)
            if not need:
                return cur
            value = self.eval(value_node, env, this)
            self.assign_to(target, value, env, this)
            return value
        cur = self.eval(target, env, this)
        value = self.eval_binary(op[:-1], cur, self.eval(value_node, env,
                                                         this))
        self.assign_to(target, value, env, this)
        return value

    def assign_to(self, target, value, env, this):
        if target[0] == "ident":
            env.set(target[1], value)
        elif target[0] == "member":
            obj = self.eval(target[1], env, this)
            key = target[2][1] if not target[3] else to_js_string(
                self.eval(target[2], env, this))
            self.set_prop(obj, key, value)
        else:
            raise JSThrow(make_error("SyntaxError",
                                     "invalid assignment target"))

    # -- property access ---------------------------------------------------

    def get_prop(self, obj, key):
        from tests.jsmini.builtins import get_member
        return get_member(self, obj, key)

    def set_prop(self, obj, key, value):
        from tests.jsmini.builtins import set_member
        set_member(self, obj, key, value)


def pattern_names(pat):
    kind = pat[0]
    if kind == "pid":
        return [pat[1]]
    if kind == "pdefault":
        return pattern_names(pat[1])
    if kind == "pobj":
        names = []
        for _, sub in pat[1]:
            names.extend(pattern_names(sub))
        if pat[2]:
            names.append(pat[2])
        return names
    if kind == "parr":
        names = []
        for sub in pat[1]:
            if sub is not None:
                names.extend(pattern_names(sub))
        return names
    return []


def install_builtins(interp):
    from tests.jsmini.builtins import install_globals
    install_globals(interp)


# JSON helpers shared with builtins.
def js_json_stringify(v, indent=None):
    def conv(x):
        if isinstance(x, JSObject):
            return {k: conv(val) for k, val in x.props.items()
                    if not isinstance(val, (JSFunction, NativeFunction))
                    and val is not UNDEF}
        if isinstance(x, JSArray):
            return [None if i is UNDEF or
                    isinstance(i, (JSFunction, NativeFunction))
                    else conv(i) for i in x.items]
        if x is UNDEF:
            return None
        if isinstance(x, float) and x == int(x) and not math.isinf(x):
            return int(x)
        return x

    if v is UNDEF or isinstance(v, (JSFunction, NativeFunction)):
        return UNDEF
    return _json.dumps(conv(v), indent=indent, separators=(
        (",", ": ") if indent else (",", ":")))


def js_json_parse(text):
    return py_to_js(_json.loads(text))
