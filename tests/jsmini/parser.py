"""Recursive-descent / Pratt parser for the jsmini JS subset.

AST nodes are plain tuples whose first element is the node kind — compact,
hashable, and easy to pattern-match in the interpreter.
"""

from __future__ import annotations

from tests.jsmini.lexer import tokenize, JSSyntaxError, Template


class Parser:
    def __init__(self, src):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # ---- token helpers ---------------------------------------------------

    def peek(self, off=0):
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_punct(self, *vals):
        t = self.peek()
        return t.kind == "punct" and t.value in vals

    def at_keyword(self, *vals):
        t = self.peek()
        return t.kind == "keyword" and t.value in vals

    def eat_punct(self, val):
        if self.at_punct(val):
            return self.next()
        return None

    def expect_punct(self, val):
        t = self.next()
        if t.kind != "punct" or t.value != val:
            raise self.err(t, f"expected {val!r}, got {t.value!r}")
        return t

    def eat_keyword(self, val):
        if self.at_keyword(val):
            return self.next()
        return None

    def err(self, tok, msg):
        line = self.src.count("\n", 0, tok.pos) + 1
        return JSSyntaxError(f"{msg} at line {line}")

    def eat_semi(self):
        self.eat_punct(";")

    # ---- program ---------------------------------------------------------

    def parse_program(self):
        stmts = []
        while self.peek().kind != "eof":
            stmts.append(self.parse_statement())
        return ("block", stmts)

    # ---- statements ------------------------------------------------------

    def parse_statement(self):
        t = self.peek()
        if t.kind == "punct":
            if t.value == "{":
                return self.parse_block()
            if t.value == ";":
                self.next()
                return ("empty",)
        if t.kind == "keyword":
            kw = t.value
            if kw in ("var", "let", "const"):
                return self.parse_var()
            if kw == "function":
                return ("funcdecl", self.parse_function(is_async=False))
            if kw == "async" and self.peek(1).kind == "keyword" \
                    and self.peek(1).value == "function":
                self.next()
                return ("funcdecl", self.parse_function(is_async=True))
            if kw == "if":
                return self.parse_if()
            if kw == "for":
                return self.parse_for()
            if kw == "while":
                return self.parse_while()
            if kw == "return":
                self.next()
                if self.at_punct(";", "}") or self.peek().kind == "eof" \
                        or self.peek().nl_before:
                    self.eat_semi()
                    return ("return", None)
                e = self.parse_expression()
                self.eat_semi()
                return ("return", e)
            if kw == "throw":
                self.next()
                e = self.parse_expression()
                self.eat_semi()
                return ("throw", e)
            if kw == "break":
                self.next()
                self.eat_semi()
                return ("break",)
            if kw == "continue":
                self.next()
                self.eat_semi()
                return ("continue",)
            if kw == "try":
                return self.parse_try()
        e = self.parse_expression()
        self.eat_semi()
        return ("expr", e)

    def parse_block(self):
        self.expect_punct("{")
        stmts = []
        while not self.at_punct("}"):
            if self.peek().kind == "eof":
                raise self.err(self.peek(), "unterminated block")
            stmts.append(self.parse_statement())
        self.next()
        return ("block", stmts)

    def parse_var(self):
        kind = self.next().value
        decls = []
        while True:
            pat = self.parse_pattern()
            init = None
            if self.eat_punct("="):
                init = self.parse_assignment()
            decls.append((pat, init))
            if not self.eat_punct(","):
                break
        self.eat_semi()
        return ("var", kind, decls)

    def parse_if(self):
        self.next()
        self.expect_punct("(")
        cond = self.parse_expression()
        self.expect_punct(")")
        then = self.parse_statement()
        els = None
        if self.eat_keyword("else"):
            els = self.parse_statement()
        return ("if", cond, then, els)

    def parse_while(self):
        self.next()
        self.expect_punct("(")
        cond = self.parse_expression()
        self.expect_punct(")")
        return ("while", cond, self.parse_statement())

    def parse_for(self):
        self.next()
        self.expect_punct("(")
        # for (;;) / for (init; test; update) / for (decl of iterable)
        if self.at_keyword("var", "let", "const"):
            decl_kind = self.next().value
            pat = self.parse_pattern()
            if self.at_keyword("of"):
                self.next()
                iterable = self.parse_assignment()
                self.expect_punct(")")
                return ("forof", decl_kind, pat, iterable,
                        self.parse_statement())
            init_val = None
            if self.eat_punct("="):
                init_val = self.parse_assignment()
            init = ("var", decl_kind, [(pat, init_val)])
        elif self.at_punct(";"):
            init = None
        else:
            init = ("expr", self.parse_expression())
        self.expect_punct(";")
        test = None if self.at_punct(";") else self.parse_expression()
        self.expect_punct(";")
        update = None if self.at_punct(")") else self.parse_expression()
        self.expect_punct(")")
        return ("for", init, test, update, self.parse_statement())

    def parse_try(self):
        self.next()
        block = self.parse_block()
        catch_param = catch_block = finally_block = None
        if self.eat_keyword("catch"):
            if self.eat_punct("("):
                catch_param = self.parse_pattern()
                self.expect_punct(")")
            catch_block = self.parse_block()
        if self.eat_keyword("finally"):
            finally_block = self.parse_block()
        if catch_block is None and finally_block is None:
            raise self.err(self.peek(), "try without catch/finally")
        return ("try", block, catch_param, catch_block, finally_block)

    # ---- patterns --------------------------------------------------------

    def parse_pattern(self):
        t = self.peek()
        if t.kind == "ident":
            self.next()
            default = None
            if self.eat_punct("="):
                default = self.parse_assignment()
            return ("pid", t.value, default)
        if self.at_punct("{"):
            self.next()
            props, rest = [], None
            while not self.at_punct("}"):
                if self.eat_punct("..."):
                    rest = self.next().value
                else:
                    key = self.parse_property_key()
                    if self.eat_punct(":"):
                        sub = self.parse_pattern()
                    else:
                        default = None
                        if self.eat_punct("="):
                            default = self.parse_assignment()
                        sub = ("pid", key, default)
                    props.append((key, sub))
                if not self.eat_punct(","):
                    break
            self.expect_punct("}")
            pat = ("pobj", props, rest)
        elif self.at_punct("["):
            self.next()
            elems = []
            while not self.at_punct("]"):
                if self.at_punct(","):
                    elems.append(None)  # hole
                else:
                    elems.append(self.parse_pattern())
                if not self.eat_punct(","):
                    break
            self.expect_punct("]")
            pat = ("parr", elems)
        else:
            raise self.err(t, f"expected pattern, got {t.value!r}")
        default = None
        if self.eat_punct("="):
            default = self.parse_assignment()
        if default is not None:
            return ("pdefault", pat, default)
        return pat

    def parse_property_key(self):
        t = self.next()
        if t.kind in ("ident", "keyword"):
            return t.value
        if t.kind == "str":
            return t.value
        if t.kind == "num":
            v = t.value
            return str(int(v)) if v == int(v) else repr(v)
        raise self.err(t, f"bad property key {t.value!r}")

    # ---- functions -------------------------------------------------------

    def parse_function(self, is_async):
        self.next()  # 'function'
        name = None
        if self.peek().kind == "ident":
            name = self.next().value
        params = self.parse_params()
        body = self.parse_block()
        return ("func", name, params, body, is_async, False)

    def parse_params(self):
        self.expect_punct("(")
        params = []
        while not self.at_punct(")"):
            if self.eat_punct("..."):
                params.append(("prest", self.next().value))
            else:
                params.append(self.parse_pattern())
            if not self.eat_punct(","):
                break
        self.expect_punct(")")
        return params

    # ---- expressions (Pratt) ---------------------------------------------

    def parse_expression(self):
        e = self.parse_assignment()
        # No comma operator (unused in the extension sources).
        return e

    ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&&=", "||=", "??="}

    def parse_assignment(self):
        arrow = self.try_parse_arrow()
        if arrow is not None:
            return arrow
        left = self.parse_ternary()
        t = self.peek()
        if t.kind == "punct" and t.value in self.ASSIGN_OPS:
            self.next()
            right = self.parse_assignment()
            return ("assign", t.value, left, right)
        return left

    def try_parse_arrow(self):
        """Backtracking arrow-function parse: [async] (params) => ... or
        [async] ident => ..."""
        start = self.i
        is_async = False
        if self.at_keyword("async") and not self.peek(1).nl_before and (
                self.peek(1).kind == "ident" or
                (self.peek(1).kind == "punct" and self.peek(1).value == "(")):
            self.next()
            is_async = True
        t = self.peek()
        try:
            if t.kind == "ident" and self.peek(1).kind == "punct" \
                    and self.peek(1).value == "=>":
                name = self.next().value
                params = [("pid", name, None)]
                self.next()  # =>
                return self.finish_arrow(params, is_async)
            if t.kind == "punct" and t.value == "(":
                params = self.parse_params()
                if self.at_punct("=>"):
                    self.next()
                    return self.finish_arrow(params, is_async)
        except JSSyntaxError:
            pass
        self.i = start
        return None

    def finish_arrow(self, params, is_async):
        if self.at_punct("{"):
            body = self.parse_block()
        else:
            body = ("block", [("return", self.parse_assignment())])
        return ("func", None, params, body, is_async, True)

    def parse_ternary(self):
        cond = self.parse_binary(0)
        if self.eat_punct("?"):
            then = self.parse_assignment()
            self.expect_punct(":")
            els = self.parse_assignment()
            return ("ternary", cond, then, els)
        return cond

    # Binary precedence table (binding powers).
    BIN_PREC = {
        "??": 1, "||": 2, "&&": 3,
        "|": 4, "^": 5, "&": 6,
        "==": 7, "!=": 7, "===": 7, "!==": 7,
        "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
        "<<": 9, ">>": 9,
        "+": 10, "-": 10,
        "*": 11, "/": 11, "%": 11,
        "**": 12,
    }
    LOGICAL = {"&&", "||", "??"}

    def parse_binary(self, min_prec):
        left = self.parse_unary()
        while True:
            t = self.peek()
            op = None
            if t.kind == "punct" and t.value in self.BIN_PREC:
                op = t.value
            elif t.kind == "keyword" and t.value in ("instanceof", "in"):
                op = t.value
            if op is None:
                return left
            prec = self.BIN_PREC[op]
            if prec < min_prec:
                return left
            self.next()
            right = self.parse_binary(prec + 1)
            kind = "logical" if op in self.LOGICAL else "binary"
            left = (kind, op, left, right)

    def parse_unary(self):
        t = self.peek()
        if t.kind == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t.value, self.parse_unary())
        if t.kind == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, True, self.parse_unary())
        if t.kind == "keyword":
            if t.value in ("typeof", "void", "delete"):
                self.next()
                return ("unary", t.value, self.parse_unary())
            if t.value == "await":
                self.next()
                return ("await", self.parse_unary())
            if t.value == "new":
                self.next()
                callee = self.parse_member_chain(self.parse_primary(),
                                                 no_call=True)
                args = []
                if self.at_punct("("):
                    args = self.parse_args()
                node = ("new", callee, args)
                return self.parse_postfix(self.parse_member_chain(node))
        return self.parse_postfix(self.parse_member_chain(
            self.parse_primary()))

    def parse_postfix(self, e):
        t = self.peek()
        if t.kind == "punct" and t.value in ("++", "--") and not t.nl_before:
            self.next()
            return ("update", t.value, False, e)
        return e

    def parse_args(self):
        self.expect_punct("(")
        args = []
        while not self.at_punct(")"):
            if self.eat_punct("..."):
                args.append(("spread", self.parse_assignment()))
            else:
                args.append(self.parse_assignment())
            if not self.eat_punct(","):
                break
        self.expect_punct(")")
        return args

    def parse_member_chain(self, e, no_call=False):
        while True:
            if self.at_punct("."):
                self.next()
                name = self.next()
                if name.kind not in ("ident", "keyword"):
                    raise self.err(name, "bad member name")
                e = ("member", e, ("str", name.value), False, False)
            elif self.at_punct("?."):
                self.next()
                if self.at_punct("("):
                    e = ("call", e, self.parse_args(), True)
                else:
                    name = self.next()
                    e = ("member", e, ("str", name.value), False, True)
            elif self.at_punct("["):
                self.next()
                idx = self.parse_expression()
                self.expect_punct("]")
                e = ("member", e, idx, True, False)
            elif self.at_punct("(") and not no_call:
                e = ("call", e, self.parse_args(), False)
            elif self.peek().kind == "tpl":
                raise self.err(self.peek(), "tagged templates unsupported")
            else:
                return e

    def parse_primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.value)
        if t.kind == "str":
            return ("str", t.value)
        if t.kind == "regex":
            return ("regexlit", t.value[0], t.value[1])
        if t.kind == "tpl":
            return self.parse_template(t.value)
        if t.kind == "ident":
            return ("ident", t.value)
        if t.kind == "keyword":
            kw = t.value
            if kw == "true":
                return ("lit", True)
            if kw == "false":
                return ("lit", False)
            if kw == "null":
                return ("lit", None)
            if kw == "undefined":
                return ("lit", ("undefined",))
            if kw == "this":
                return ("this",)
            if kw == "function":
                self.i -= 1
                return self.parse_function(is_async=False)
            if kw == "async" and self.peek().kind == "keyword" \
                    and self.peek().value == "function":
                return self.parse_function(is_async=True)
            # Keywords used as plain identifiers in expression position
            # (e.g. `default` as a property) are not needed; reject.
            raise self.err(t, f"unexpected keyword {kw!r}")
        if t.kind == "punct":
            if t.value == "(":
                e = self.parse_expression()
                self.expect_punct(")")
                return e
            if t.value == "[":
                elems = []
                while not self.at_punct("]"):
                    if self.eat_punct("..."):
                        elems.append(("spread", self.parse_assignment()))
                    else:
                        elems.append(self.parse_assignment())
                    if not self.eat_punct(","):
                        break
                self.expect_punct("]")
                return ("array", elems)
            if t.value == "{":
                return self.parse_object_literal()
        raise self.err(t, f"unexpected token {t.value!r}")

    def parse_object_literal(self):
        props = []
        while not self.at_punct("}"):
            if self.eat_punct("..."):
                props.append(("spread", self.parse_assignment()))
            elif self.at_punct("["):
                self.next()
                key_expr = self.parse_assignment()
                self.expect_punct("]")
                self.expect_punct(":")
                props.append(("computed", key_expr, self.parse_assignment()))
            else:
                is_async = False
                if self.at_keyword("async") and self.peek(1).kind in (
                        "ident", "keyword", "str") and not (
                        self.peek(1).kind == "punct"):
                    # `async name(...)` method — but NOT `async:` or
                    # `async,` or `async}` (async as a plain key).
                    nxt = self.peek(1)
                    if not (nxt.kind == "punct"):
                        self.next()
                        is_async = True
                key = self.parse_property_key()
                if self.at_punct("("):
                    params = self.parse_params()
                    body = self.parse_block()
                    fn = ("func", key, params, body, is_async, False)
                    props.append(("prop", key, fn))
                elif self.eat_punct(":"):
                    props.append(("prop", key, self.parse_assignment()))
                else:
                    props.append(("prop", key, ("ident", key)))
            if not self.eat_punct(","):
                break
        self.expect_punct("}")
        return ("object", props)

    def parse_template(self, tpl: Template):
        exprs = [Parser(src).parse_expression() for src in tpl.exprs]
        return ("tpl", tpl.chunks, exprs)


def parse(src):
    return Parser(src).parse_program()
