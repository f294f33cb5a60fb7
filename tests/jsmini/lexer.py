"""Tokenizer for the jsmini JS subset (see tests/jsmini/__init__.py)."""

from __future__ import annotations

import re
from dataclasses import dataclass


class JSSyntaxError(SyntaxError):
    pass


KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for", "while",
    "do", "break", "continue", "try", "catch", "finally", "throw", "new",
    "typeof", "instanceof", "in", "of", "delete", "void", "this", "null",
    "true", "false", "undefined", "async", "await", "class", "switch",
    "case", "default", "yield",
}

# Longest-first so e.g. '===' wins over '=='.
PUNCTUATORS = [
    "...", "===", "!==", "**=", "<<=", ">>=", "&&=", "||=", "??=",
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "++", "--",
    "+=", "-=", "*=", "/=", "%=", "**", "<<", ">>", "&=", "|=", "^=",
    "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+", "-", "*", "/",
    "%", "&", "|", "^", "!", "~", "?", ":", "=", ".", "`",
]

IDENT_RE = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
NUM_RE = re.compile(
    r"0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")

# A '/' starts a regex literal (not division) when the previous significant
# token cannot end an expression.
_REGEX_ALLOWED_AFTER_PUNCT = {
    "(", ",", "=", ":", "[", "!", "&", "|", "?", "{", "}", ";", "=>", "==",
    "===", "!=", "!==", "&&", "||", "??", "+", "-", "*", "/", "%", "<", ">",
    "<=", ">=", "+=", "-=", "*=", "/=",
}
_REGEX_ALLOWED_AFTER_KEYWORD = {
    "return", "typeof", "instanceof", "in", "of", "new", "throw", "case",
    "do", "else", "await", "yield",
}


@dataclass
class Token:
    kind: str      # num str tpl regex ident keyword punct eof
    value: object  # parsed value (str for ident/keyword/punct)
    pos: int       # offset into source, for error messages
    nl_before: bool = False  # a newline separates this from the prior token

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"Token({self.kind},{self.value!r})"


@dataclass
class Template:
    """A template literal: N string chunks interleaved with N-1 raw
    expression sources (parsed recursively by the parser)."""
    chunks: list
    exprs: list


def _line_col(src, pos):
    line = src.count("\n", 0, pos) + 1
    col = pos - (src.rfind("\n", 0, pos) + 1) + 1
    return line, col


def _err(src, pos, msg):
    line, col = _line_col(src, pos)
    return JSSyntaxError(f"{msg} at line {line}:{col}")


_STR_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v",
    "0": "\0", "'": "'", '"': '"', "`": "`", "\\": "\\", "\n": "",
}


def _read_string(src, i, quote):
    out = []
    i += 1
    while i < len(src):
        c = src[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\\":
            nxt = src[i + 1] if i + 1 < len(src) else ""
            if nxt == "u":
                if src[i + 2] == "{":
                    j = src.index("}", i + 3)
                    out.append(chr(int(src[i + 3:j], 16)))
                    i = j + 1
                else:
                    out.append(chr(int(src[i + 2:i + 6], 16)))
                    i += 6
            elif nxt == "x":
                out.append(chr(int(src[i + 2:i + 4], 16)))
                i += 4
            else:
                out.append(_STR_ESCAPES.get(nxt, nxt))
                i += 2
        elif c == "\n":
            raise _err(src, i, "unterminated string")
        else:
            out.append(c)
            i += 1
    raise _err(src, i, "unterminated string")


def _read_template(src, i):
    """src[i] == '`'.  Returns (Template, next_index)."""
    chunks, exprs, cur = [], [], []
    i += 1
    while True:
        if i >= len(src):
            raise _err(src, i, "unterminated template literal")
        c = src[i]
        if c == "`":
            chunks.append("".join(cur))
            return Template(chunks, exprs), i + 1
        if c == "\\":
            nxt = src[i + 1] if i + 1 < len(src) else ""
            cur.append(_STR_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        if c == "$" and i + 1 < len(src) and src[i + 1] == "{":
            chunks.append("".join(cur))
            cur = []
            depth, j = 1, i + 2
            start = j
            while depth:
                if j >= len(src):
                    raise _err(src, i, "unterminated ${...}")
                cj = src[j]
                if cj == "{":
                    depth += 1
                elif cj == "}":
                    depth -= 1
                elif cj in "\"'`":
                    # Skip nested strings/templates coarsely.
                    if cj == "`":
                        _, j = _read_template(src, j)
                        continue
                    _, j = _read_string(src, j, cj)
                    continue
                j += 1
            exprs.append(src[start:j - 1])
            i = j
            continue
        cur.append(c)
        i += 1


def _read_regex(src, i):
    """src[i] == '/'.  Returns (pattern, flags, next_index)."""
    j = i + 1
    in_class = False
    while j < len(src):
        c = src[j]
        if c == "\\":
            j += 2
            continue
        if c == "[":
            in_class = True
        elif c == "]":
            in_class = False
        elif c == "/" and not in_class:
            k = j + 1
            while k < len(src) and src[k] in "gimsuy":
                k += 1
            return src[i + 1:j], src[j + 1:k], k
        elif c == "\n":
            break
        j += 1
    raise _err(src, i, "unterminated regex literal")


def tokenize(src):
    toks = []
    i = 0
    n = len(src)
    nl = False
    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            nl = True
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise _err(src, i, "unterminated block comment")
            if "\n" in src[i:j]:
                nl = True
            i = j + 2
            continue
        start = i
        if c in "\"'":
            s, i = _read_string(src, i, c)
            toks.append(Token("str", s, start, nl))
        elif c == "`":
            tpl, i = _read_template(src, i)
            toks.append(Token("tpl", tpl, start, nl))
        elif c == "/" and _regex_allowed(toks):
            pat, flags, i = _read_regex(src, i)
            toks.append(Token("regex", (pat, flags), start, nl))
        else:
            m = NUM_RE.match(src, i)
            if m and (c.isdigit() or (c == "." and i + 1 < n
                                      and src[i + 1].isdigit())):
                text = m.group(0)
                val = (float(int(text, 16)) if text[:2].lower() == "0x"
                       else float(text))
                toks.append(Token("num", val, start, nl))
                i = m.end()
            else:
                m = IDENT_RE.match(src, i)
                if m:
                    name = m.group(0)
                    kind = "keyword" if name in KEYWORDS else "ident"
                    toks.append(Token(kind, name, start, nl))
                    i = m.end()
                else:
                    for p in PUNCTUATORS:
                        if src.startswith(p, i):
                            toks.append(Token("punct", p, start, nl))
                            i += len(p)
                            break
                    else:
                        raise _err(src, i, f"unexpected character {c!r}")
        nl = False
    toks.append(Token("eof", None, n, nl))
    return toks


def _regex_allowed(toks):
    for t in reversed(toks):
        if t.kind == "punct":
            return t.value in _REGEX_ALLOWED_AFTER_PUNCT
        if t.kind == "keyword":
            return t.value in _REGEX_ALLOWED_AFTER_KEYWORD
        return False  # ident / num / str / tpl / regex end an expression
    return True
