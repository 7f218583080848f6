"""Tokenizer for the Jolt shift expression DSL.

Semantics match the reference tokenizer
(fluvio-jolt/src/dsl/tokenizer.rs:39-144): 12 single-char structural
tokens, backslash escapes over exactly the 13-char special set, and
greedy key runs. Implemented as a straightforward scanner over the
string with a one-token putback buffer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from .errors import ParseError

# Token kinds (structural). Keys carry their text in Token.text.
DOLLAR = "$"
AMP = "&"
AT = "@"
SQUARE = "#"
STAR = "*"
PIPE = "|"
OPEN_BRKT = "["
CLOSE_BRKT = "]"
OPEN_PRNTH = "("
CLOSE_PRNTH = ")"
DOT = "."
COMMA = ","
KEY = "key"

_STRUCTURAL = {
    "$": DOLLAR,
    "&": AMP,
    "@": AT,
    "#": SQUARE,
    "*": STAR,
    "|": PIPE,
    "[": OPEN_BRKT,
    "]": CLOSE_BRKT,
    "(": OPEN_PRNTH,
    ")": CLOSE_PRNTH,
    ".": DOT,
    ",": COMMA,
}

# The full escapable set (tokenizer.rs:142-144): structural chars + backslash.
SPECIAL_CHARS = frozenset("$&@#*|[]().,\\")


class Token(NamedTuple):
    pos: int
    kind: str
    text: str  # key text for KEY tokens, else the structural char


class Tokenizer:
    __slots__ = ("_s", "_i", "_buf")

    def __init__(self, s: str):
        self._s = s
        self._i = 0
        self._buf: Optional[Token] = None

    def pos(self) -> int:
        return self._i

    def put_back(self, token: Token) -> None:
        if self._buf is not None:
            raise ParseError(self._i, "putback buffer full")
        self._buf = token

    def next(self) -> Optional[Token]:
        if self._buf is not None:
            tok, self._buf = self._buf, None
            return tok

        s, i = self._s, self._i
        if i >= len(s):
            return None

        c = s[i]
        kind = _STRUCTURAL.get(c)
        if kind is not None:
            self._i = i + 1
            return Token(i, kind, c)

        # Key run: consume until a structural char; honor backslash escapes.
        start = i
        out: list[str] = []
        while i < len(s):
            c = s[i]
            if c == "\\":
                if i + 1 >= len(s):
                    raise ParseError(i + 1, "unexpected end of input after escape")
                nxt = s[i + 1]
                if nxt not in SPECIAL_CHARS:
                    raise ParseError(i + 1, f"invalid escape character {nxt!r}")
                out.append(nxt)
                i += 2
            elif c in _STRUCTURAL:
                break
            else:
                out.append(c)
                i += 1
        self._i = i
        return Token(start, KEY, "".join(out))
