"""Loader for the reference's golden test corpus.

The fixtures live in the read-only reference checkout (they are test
DATA defining expected behavior; the engine itself is written from
scratch). When the reference tree is absent (e.g. this repo used
standalone), fixture-driven tests skip and the local hand-written
corpus in tests/data/ still runs.

Harness parity: the java suite files may contain ``//`` comments that
must be stripped line-wise, where a ``//`` outside a string literal
truncates the line (reference tests/java/util.rs:13-37); bare shift
specs are wrapped as ``[{"operation":"shift","spec":...}]``
(util.rs:60-63).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Iterator, NamedTuple

REFERENCE_ROOT = Path(os.environ.get("JOLT_REFERENCE_ROOT", "/root/reference"))
INTEGRATION_DIR = REFERENCE_ROOT / "fluvio-jolt" / "tests" / "data"
JAVA_SHIFT_DIR = REFERENCE_ROOT / "fluvio-jolt" / "tests" / "java" / "resources" / "shift"
DATA_SHIFT_DIR = INTEGRATION_DIR / "shift"

INTEGRATION_NAMES = [
    "simple",
    "shift_and_default",
    "remove",
    "shift_wildcards",
    "simple_wildcards",
    "shift_with_or_condition",
    "variables",
    "from_benchmark",
    "nested_variables",
]


class Fixture(NamedTuple):
    name: str
    suite: str
    input: object
    spec: list  # full op-list form
    expected: object


def strip_comments(text: str) -> str:
    """Line-based // comment stripper with in-string awareness, matching
    the reference harness exactly (including its join-without-newlines)."""
    out_lines = []
    for line in text.split("\n"):
        in_str = False
        maybe_comment = False
        cut = None
        for idx, c in enumerate(line):
            if c == '"':
                in_str = not in_str
                maybe_comment = False
            elif c == "/":
                if maybe_comment:
                    cut = idx - 1
                    break
                maybe_comment = not in_str
            else:
                maybe_comment = False
        out_lines.append(line if cut is None else line[:cut])
    return "".join(out_lines)


def reference_available() -> bool:
    return INTEGRATION_DIR.is_dir()


def iter_fixtures() -> Iterator[Fixture]:
    if not reference_available():
        return
    for name in INTEGRATION_NAMES:
        doc = json.loads((INTEGRATION_DIR / f"{name}.json").read_text())
        yield Fixture(name, "integration", doc["input"], doc["spec"], doc["expected"])
    for suite, directory in (("java_shift", JAVA_SHIFT_DIR), ("data_shift", DATA_SHIFT_DIR)):
        if not directory.is_dir():
            continue
        for path in sorted(directory.glob("*.json")):
            doc = json.loads(strip_comments(path.read_text()))
            spec = [{"operation": "shift", "spec": doc["spec"]}]
            yield Fixture(path.stem, suite, doc["input"], spec, doc["expected"])


def fixture_params():
    """(id, fixture) pairs for pytest.parametrize."""
    return [(f"{f.suite}:{f.name}", f) for f in iter_fixtures()]
