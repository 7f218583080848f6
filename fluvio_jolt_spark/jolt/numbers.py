"""serde_json-compatible number-to-string coercion.

When a JSON number is used as a match key or output key, the reference
stringifies it via serde_json's Display (integers verbatim; floats via
the ryu shortest-round-trip algorithm) — fluvio-jolt/src/shift.rs:85-89,
246. Python's ``repr`` uses the same shortest-round-trip digits but
formats exponents as ``e+NN``/``e-0N``; normalize to ryu's style.
"""

from __future__ import annotations


def number_to_string(n) -> str:
    if isinstance(n, bool):  # guard: bool is an int subclass but is not a Number
        raise TypeError("bool is not a JSON number")
    if isinstance(n, int):
        return str(n)
    s = repr(float(n))
    if "e" in s or "E" in s:
        mantissa, _, exp = s.partition("e")
        sign = ""
        if exp.startswith("+"):
            exp = exp[1:]
        elif exp.startswith("-"):
            sign = "-"
            exp = exp[1:]
        exp = exp.lstrip("0") or "0"
        s = f"{mantissa}e{sign}{exp}"
    return s
