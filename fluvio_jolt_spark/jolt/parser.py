"""Recursive-descent parser for Jolt shift LHS/RHS expressions.

Grammar per reference SPEC.md ("Expression Grammar" + sugar rules);
behavioral parity with fluvio-jolt/src/dsl/parser.rs:22-440, including
the MAX_DEPTH=4 guard on nested ``@( )`` expressions (parser.rs:7,68-74)
and the literal-vs-pipes collapse (parser.rs:271-282).
"""

from __future__ import annotations

import re
from typing import Optional

from . import tokenizer as tk
from .ast import (
    AmpEntry,
    AmpIndex,
    AmpLhs,
    AtEntry,
    AtIndex,
    AtLhs,
    CompositeKeyPart,
    DollarLhs,
    EmptyIndex,
    IndexPart,
    KeyEntry,
    KeyPart,
    LiteralIndex,
    LiteralLhs,
    PipesLhs,
    Rhs,
    SquareLhs,
    Stars,
)
from .errors import ParseError
from .tokenizer import Token, Tokenizer

MAX_DEPTH = 4

# Rust usize::from_str accepts an optional leading '+' and leading zeros.
_USIZE_RE = re.compile(r"^\+?[0-9]+$")


def _parse_index(text: str, pos: int) -> int:
    if not _USIZE_RE.match(text):
        raise ParseError(pos, f"invalid index {text!r}")
    return int(text)


class Parser:
    __slots__ = ("_t",)

    def __init__(self, s: str):
        self._t = Tokenizer(s)

    # ---- public entry points ----

    def parse_lhs(self):
        token = self._t.next()
        if token is None:
            # Empty LHS matches only the empty key (parser.rs:25).
            return PipesLhs([Stars([""])])

        k = token.kind
        if k == tk.SQUARE:
            res = SquareLhs(self._parse_square())
        elif k == tk.AT:
            idx, rhs = self._parse_at_tuple(0)
            res = AtLhs(idx, rhs)
        elif k == tk.DOLLAR:
            i0, i1 = self._parse_num_tuple()
            res = DollarLhs(i0, i1)
        elif k == tk.AMP:
            i0, i1 = self._parse_num_tuple()
            res = AmpLhs(i0, i1)
        elif k in (tk.KEY, tk.STAR, tk.PIPE):
            self._t.put_back(token)
            res = self._parse_pipes_or_literal()
        else:
            raise ParseError(token.pos, f"unexpected token {token.text!r} in lhs")

        trailing = self._t.next()
        if trailing is not None:
            raise ParseError(trailing.pos, f"unexpected trailing token {trailing.text!r}")
        return res

    def parse_rhs(self) -> Rhs:
        rhs = self._parse_rhs_impl(0)
        trailing = self._t.next()
        if trailing is not None:
            raise ParseError(trailing.pos, f"unexpected trailing token {trailing.text!r}")
        return rhs

    # ---- internals ----

    def _parse_rhs_impl(self, depth: int) -> Rhs:
        if depth > MAX_DEPTH:
            raise ParseError(self._t.pos(), f"maximum recursion depth {MAX_DEPTH} exceeded")

        parts = []
        token = self._t.next()
        if token is None:
            return Rhs(parts)

        if token.kind == tk.OPEN_BRKT:
            parts.append(IndexPart(self._parse_index_op(depth)))
            self._expect(tk.CLOSE_BRKT)
        else:
            self._t.put_back(token)
            part = self._parse_rhs_part(depth)
            if part is not None:
                parts.append(part)

        while True:
            token = self._t.next()
            if token is None:
                break
            if token.kind == tk.OPEN_BRKT:
                parts.append(IndexPart(self._parse_index_op(depth)))
                self._expect(tk.CLOSE_BRKT)
            elif token.kind == tk.DOT:
                part = self._parse_rhs_part(depth)
                if part is None:
                    break
                parts.append(part)
            else:
                self._t.put_back(token)
                break

        return Rhs(parts)

    def _parse_rhs_part(self, depth: int):
        entries = []
        while True:
            token = self._t.next()
            if token is None:
                break
            if token.kind == tk.AMP:
                i0, i1 = self._parse_num_tuple()
                entries.append(AmpEntry(i0, i1))
            elif token.kind == tk.AT:
                idx, rhs = self._parse_at_tuple(depth)
                entries.append(AtEntry(idx, rhs))
            elif token.kind == tk.KEY:
                entries.append(KeyEntry(token.text))
            else:
                self._t.put_back(token)
                break

        if not entries:
            return None
        if len(entries) == 1:
            return KeyPart(entries[0])
        return CompositeKeyPart(entries)

    def _parse_index_op(self, depth: int):
        token = self._get_next()
        if token.kind == tk.AMP:
            i0, i1 = self._parse_num_tuple()
            return AmpIndex(i0, i1)
        if token.kind == tk.CLOSE_BRKT:
            self._t.put_back(token)
            return EmptyIndex()
        if token.kind == tk.KEY:
            return LiteralIndex(_parse_index(token.text, token.pos))
        if token.kind == tk.AT:
            idx, rhs = self._parse_at_tuple(depth)
            return AtIndex(idx, rhs)
        raise ParseError(token.pos, f"unexpected token {token.text!r} in index op")

    def _parse_square(self) -> str:
        token = self._t.next()
        if token is None:
            return ""
        if token.kind == tk.KEY:
            return token.text
        raise ParseError(token.pos, f"unexpected token {token.text!r} after '#'")

    def _parse_at_tuple(self, depth: int):
        """``@`` sugar: bare -> (0, empty); ``@(rhs)`` -> (0, rhs);
        ``@(n,rhs)`` -> (n, rhs). (parser.rs:190-224)"""
        token = self._t.next()
        if token is None:
            return 0, Rhs([])
        if token.kind != tk.OPEN_PRNTH:
            self._t.put_back(token)
            return 0, Rhs([])

        rhs_pos = self._t.pos()
        rhs = self._parse_rhs_impl(depth + 1)

        token = self._get_next()
        if token.kind == tk.CLOSE_PRNTH:
            return 0, rhs
        if token.kind != tk.COMMA:
            raise ParseError(token.pos, f"unexpected token {token.text!r} in @ tuple")

        idx = self._rhs_to_idx(rhs, rhs_pos)
        rhs = self._parse_rhs_impl(depth + 1)
        self._expect(tk.CLOSE_PRNTH)
        return idx, rhs

    def _parse_num_tuple(self):
        """``&``/``$`` sugar: bare -> (0,0); ``&(x)`` -> (x,0);
        ``&(x,y)`` -> (x,y). (parser.rs:226-269)"""
        token = self._t.next()
        if token is None:
            return 0, 0
        if token.kind != tk.OPEN_PRNTH:
            self._t.put_back(token)
            return 0, 0

        idx0 = self._get_idx()
        token = self._get_next()
        if token.kind == tk.CLOSE_PRNTH:
            return idx0, 0
        if token.kind != tk.COMMA:
            raise ParseError(token.pos, f"unexpected token {token.text!r} in num tuple")
        idx1 = self._get_idx()
        self._expect(tk.CLOSE_PRNTH)
        return idx0, idx1

    def _get_idx(self) -> int:
        token = self._get_next()
        if token.kind != tk.KEY:
            raise ParseError(token.pos, "expected index")
        return _parse_index(token.text, token.pos)

    def _parse_pipes_or_literal(self):
        pipes = self._parse_pipes()
        if len(pipes) == 1 and len(pipes[0].segments) == 1:
            return LiteralLhs(pipes[0].segments[0])
        return PipesLhs(pipes)

    def _parse_pipes(self) -> list[Stars]:
        pipes: list[Stars] = []
        last = "none"  # none | stars | pipe
        while True:
            token = self._t.next()
            if token is None:
                break
            if token.kind in (tk.KEY, tk.STAR):
                if last in ("none", "pipe"):
                    self._t.put_back(token)
                    pipes.append(self._parse_stars())
                else:
                    raise ParseError(token.pos, f"unexpected token {token.text!r} in pipes")
                last = "stars"
            elif token.kind == tk.PIPE:
                if last == "none":
                    pipes.append(Stars([""]))
                elif last == "pipe":
                    raise ParseError(token.pos, "unexpected '|'")
                last = "pipe"
            else:
                self._t.put_back(token)
                break
        if last == "pipe":
            pipes.append(Stars([""]))
        return pipes

    def _parse_stars(self) -> Stars:
        segments: list[str] = []
        last = "none"  # none | star | key
        while True:
            token = self._t.next()
            if token is None:
                break
            if token.kind == tk.STAR:
                if last == "none":
                    segments.append("")
                elif last == "star":
                    raise ParseError(token.pos, "unexpected '*'")
                last = "star"
            elif token.kind == tk.KEY:
                if last in ("none", "star"):
                    segments.append(token.text)
                else:
                    raise ParseError(token.pos, f"unexpected key {token.text!r}")
                last = "key"
            else:
                self._t.put_back(token)
                break
        if last == "star":
            segments.append("")
        return Stars(segments)

    @staticmethod
    def _rhs_to_idx(rhs: Rhs, pos: int) -> int:
        if len(rhs.parts) == 1 and isinstance(rhs.parts[0], KeyPart):
            entry = rhs.parts[0].entry
            if isinstance(entry, KeyEntry):
                return _parse_index(entry.key, pos)
        raise ParseError(pos, "expected index")

    def _get_next(self) -> Token:
        token = self._t.next()
        if token is None:
            raise ParseError(self._t.pos(), "unexpected end of input")
        return token

    def _expect(self, kind: str) -> None:
        token = self._get_next()
        if token.kind != kind:
            raise ParseError(token.pos, f"expected {kind!r}, got {token.text!r}")


def parse_lhs(s: str):
    return Parser(s).parse_lhs()


def parse_rhs(s: str) -> Rhs:
    return Parser(s).parse_rhs()
