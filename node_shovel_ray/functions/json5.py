"""Minimal-complete JSON5 parser (public spec, json5.org).

The reference's json5 decoder wraps the ``json5`` npm package
(src/decoders/json5.js:4-9); no Python json5 library ships in this
container, so the grammar is implemented directly: comments (``//`` and
``/* */``), unquoted identifier keys, single- OR double-quoted strings with
escapes and line continuations, trailing commas, hex numbers, leading/
trailing decimal points, signed numbers, ``Infinity``/``NaN``.

One function: :func:`parse` (str → Python value); raises ``ValueError`` on
malformed input, like ``json.loads``.
"""

from __future__ import annotations

import re

_WS = " \t\n\r\v\f   ﻿"
_IDENT_RE = re.compile(r"[$A-Za-z_][$A-Za-z0-9_]*")
_HEX_RE = re.compile(r"[+-]?0[xX][0-9a-fA-F]+")
_NUM_RE = re.compile(
    r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
)
_ESCAPES = {
    "b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t", "v": "\v",
    "'": "'", '"': '"', "\\": "\\", "/": "/", "0": "\0", "\n": "", "\r": "",
    " ": "", " ": "",
}


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def err(self, what: str) -> ValueError:
        return ValueError(f"JSON5: {what} at offset {self.i}")

    def ws(self) -> None:
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c in _WS:
                self.i += 1
            elif s.startswith("//", self.i):
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith("/*", self.i):
                j = s.find("*/", self.i + 2)
                if j < 0:
                    raise self.err("unterminated comment")
                self.i = j + 2
            else:
                return

    def peek(self) -> str:
        if self.i >= len(self.s):
            raise self.err("unexpected end")
        return self.s[self.i]

    def value(self):
        self.ws()
        c = self.peek()
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "'\"":
            return self.string(c)
        for lit, v in (
            ("true", True), ("false", False), ("null", None),
            ("Infinity", float("inf")), ("NaN", float("nan")),
            ("+Infinity", float("inf")), ("-Infinity", float("-inf")),
            ("+NaN", float("nan")), ("-NaN", float("nan")),
        ):
            if self.s.startswith(lit, self.i):
                self.i += len(lit)
                return v
        m = _HEX_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return int(m.group(), 16)
        m = _NUM_RE.match(self.s, self.i)
        if m:
            self.i = m.end()
            txt = m.group()
            if re.fullmatch(r"[+-]?\d+", txt):
                return int(txt)
            return float(txt)
        raise self.err(f"unexpected character {c!r}")

    def obj(self) -> dict:
        self.i += 1  # {
        out: dict = {}
        while True:
            self.ws()
            if self.peek() == "}":
                self.i += 1
                return out
            c = self.peek()
            if c in "'\"":
                key = self.string(c)
            else:
                m = _IDENT_RE.match(self.s, self.i)
                if not m:
                    raise self.err("expected property name")
                key = m.group()
                self.i = m.end()
            self.ws()
            if self.peek() != ":":
                raise self.err("expected ':'")
            self.i += 1
            out[key] = self.value()
            self.ws()
            c = self.peek()
            if c == ",":
                self.i += 1
            elif c != "}":
                raise self.err("expected ',' or '}'")

    def arr(self) -> list:
        self.i += 1  # [
        out: list = []
        while True:
            self.ws()
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws()
            c = self.peek()
            if c == ",":
                self.i += 1
            elif c != "]":
                raise self.err("expected ',' or ']'")

    def string(self, quote: str) -> str:
        self.i += 1
        out: list[str] = []
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c == quote:
                self.i += 1
                return "".join(out)
            if c == "\\":
                self.i += 1
                if self.i >= n:
                    break
                e = s[self.i]
                if e == "u":
                    out.append(chr(int(s[self.i + 1 : self.i + 5], 16)))
                    self.i += 5
                elif e == "x":
                    out.append(chr(int(s[self.i + 1 : self.i + 3], 16)))
                    self.i += 3
                elif e in _ESCAPES:
                    out.append(_ESCAPES[e])
                    self.i += 1
                    if e == "\r" and self.i < n and s[self.i] == "\n":
                        self.i += 1  # \r\n line continuation
                else:
                    out.append(e)
                    self.i += 1
            elif c in "\n\r":
                raise self.err("unescaped newline in string")
            else:
                out.append(c)
                self.i += 1
        raise self.err("unterminated string")


def parse(text: str):
    """JSON5.parse — full-input parse with trailing-garbage rejection."""
    p = _P(text)
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise p.err("trailing characters")
    return v
