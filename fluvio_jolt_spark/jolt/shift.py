"""The shift operation: spec-driven copy from input tree to output tree.

Behavioral parity with the reference interpreter
(fluvio-jolt/src/shift.rs), including its quirks:

* The match-path stack is seeded with the literal key ``"root"``
  (shift.rs:10,17), so ``&(maxdepth)`` resolves to ``"root"``.
* Output starts as JSON null and may become a scalar, object, or
  top-level array (shift.rs:19).
* Per spec object, infallible ops ($ / @ / #) run once, first, in spec
  order; then for each input key the fallible buckets probe in order
  literal → & → pipes/globs, first match wins (shift.rs:43-58,105-144).
* Glob matching captures via greedy-left ``find`` WITHOUT consuming the
  matched literal and without anchoring the tail (shift.rs:371-433) —
  e.g. ``a*b`` matches ``"aXbZZ"`` with capture ``"X"``.
* Write collisions: null slot → set; array slot → push; scalar slot →
  wrap into a two-element array (shift.rs:355-366). (The reference
  SPEC.md:80 claims collisions error; the code and golden tests say
  merge — the code wins.)
* Non-object input nodes are matched by a coerced key: bools as
  "true"/"false", numbers via serde-style stringification, arrays by
  stringified element index, null as "null" (shift.rs:60-97).
"""

from __future__ import annotations

from typing import Any, Optional

from .ast import (
    AmpEntry,
    AmpIndex,
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
    Rhs,
    SquareLhs,
    Stars,
)
from .compiler import JoltObject, ShiftOp, Thrash
from .errors import (
    ArrIndexOutOfRange,
    EvalStringError,
    InvalidIndex,
    KeyNotFound,
    MatchIndexOutOfRange,
    PathIndexOutOfRange,
    UnexpectedRhsEntry,
)
from .numbers import number_to_string

ROOT_KEY = "root"
_MISSING = object()

# A path frame is (captures: list[str], node: Any). captures[0] is the
# whole matched key; further entries are glob captures.
Frame = tuple


def apply_shift(op: ShiftOp, value: Any) -> Any:
    path: list[Frame] = [([ROOT_KEY], value)]
    out_box: list[Any] = [None]
    _apply(op.root, path, out_box)
    return out_box[0]


def _apply(obj: JoltObject, path: list[Frame], out_box: list[Any]) -> None:
    tip = path[-1]

    # Infallible ops: run once, in spec order, evaluated against the
    # current path; the tip frame is duplicated while writing so that
    # RHS &/@ indices see the same stack the reference sees (shift.rs:43-58).
    for lhs, rhs_list in obj.infallible:
        if isinstance(lhs, DollarLhs):
            v: Any = _get_match(lhs.path_idx, lhs.match_idx, path)
        elif isinstance(lhs, AtLhs):
            v = _eval_at(lhs.path_idx, lhs.rhs, path)
        else:  # SquareLhs
            v = lhs.literal
        path.append(tip)
        try:
            for rhs in rhs_list:
                write_rhs(rhs, _clone(v), path, out_box)
        finally:
            path.pop()

    node = tip[1]
    if isinstance(node, dict):
        # Fast path (semantics-preserving, see JoltObject docstring):
        # fully-exact spec objects dispatch each input key with ONE dict
        # probe and no per-key helper call. rentry values are never None,
        # so .get(k) returning None means "no rule fires".
        em = obj.exact_map
        if em is not None and not obj.pipes_rest:
            for k, v in node.items():
                rentry = em.get(k)
                if rentry is None:
                    continue
                path.append(([k], v))
                # _apply_match body inlined (leaf writes dominate)
                cls = rentry.__class__
                if cls is list:
                    needs_clone = v.__class__ is dict or v.__class__ is list
                    for rhs in rentry:
                        vv = _clone(v) if needs_clone else v
                        w = rhs.writer
                        if w is not None:
                            w(vv, path, out_box)
                        else:
                            _insert_val_to_rhs(rhs, vv, path, out_box)
                elif cls is JoltObject:
                    _apply(rentry, path, out_box)
                path.pop()
            return
        for k, v in node.items():
            _match_obj_and_key(obj, path, k, v, out_box)
    elif isinstance(node, bool):
        _match_obj_and_key(obj, path, "true" if node else "false", node, out_box)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            _match_obj_and_key(obj, path, str(i), v, out_box)
    elif isinstance(node, (int, float)):
        _match_obj_and_key(obj, path, number_to_string(node), node, out_box)
    elif isinstance(node, str):
        _match_obj_and_key(obj, path, node, node, out_box)
    else:  # None (JSON null)
        _match_obj_and_key(obj, path, "null", node, out_box)


def _match_obj_and_key(
    obj: JoltObject, path: list[Frame], k: str, v: Any, out_box: list[Any]
) -> None:
    """Probe the fallible buckets for one input key; first match wins and
    exactly one rule fires per key (shift.rs:105-144). Literal and
    all-literal-pipes probes use compiled hash lookups (see
    JoltObject docstring for why that preserves reference semantics).
    No try/finally around the recursion: an exception aborts the whole
    record (reshape dead-letters it) and ``path``/``out_box`` are
    per-record state, so the unwound stack is never observed."""
    em = obj.exact_map
    if em is not None:
        # & bucket empty: literal + leading exact pipes groups merged.
        rentry = em.get(k)
        if rentry is not None:
            path.append(([k], v))
            _apply_match(v, rentry, path, out_box)
            path.pop()
            return
        pipes = obj.pipes_rest
    else:
        rentry = obj.literal_map.get(k, _MISSING)
        if rentry is not _MISSING:
            path.append(([k], v))
            _apply_match(v, rentry, path, out_box)
            path.pop()
            return

        for (p_idx, m_idx), rentry in obj.amp:
            m = _get_match(p_idx, m_idx, path)
            if m == k:
                path.append(([m], v))
                _apply_match(v, rentry, path, out_box)
                path.pop()
                return
        pipes = obj.pipes

    for alternatives, rentry, exact in pipes:
        if exact is not None:
            if k in exact:
                path.append(([k], v))
                _apply_match(v, rentry, path, out_box)
                path.pop()
                return
            continue
        for stars in alternatives:
            m = _match_stars(stars.segments, k)
            if m is not None:
                path.append((m, v))
                _apply_match(v, rentry, path, out_box)
                path.pop()
                return


def _apply_match(v: Any, rentry, path: list[Frame], out_box: list[Any]) -> None:
    # Dispatch ordered by hot-path frequency (leaf writes dominate);
    # exact-class checks are safe — REntry is list | JoltObject | Thrash,
    # never a subclass. Scalars skip the clone: only containers need a
    # copy to keep output slots independent (shift.rs:55,156).
    cls = rentry.__class__
    if cls is list:
        needs_clone = v.__class__ is dict or v.__class__ is list
        for rhs in rentry:
            vv = _clone(v) if needs_clone else v
            w = rhs.writer
            if w is not None:
                w(vv, path, out_box)
            else:
                _insert_val_to_rhs(rhs, vv, path, out_box)
    elif cls is JoltObject:
        _apply(rentry, path, out_box)
    # else Thrash: match and discard


def _clone(v: Any) -> Any:
    # The reference clones the value on every write (shift.rs:55,156);
    # container copies keep output slots independent of the input tree
    # and of each other when one value is written to several paths.
    if isinstance(v, dict):
        return {k: _clone(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_clone(x) for x in v]
    return v


# ---- evaluation (read side) ----


def _eval_at(path_idx: int, rhs: Rhs, path: list[Frame]) -> Any:
    if path_idx >= len(path):
        raise PathIndexOutOfRange(path_idx, len(path))
    node = path[len(path) - path_idx - 1][1]
    return _eval_rhs(rhs, node, path)


def _eval_rhs(rhs: Rhs, v: Any, path: list[Frame]) -> Any:
    for part in rhs.parts:
        if isinstance(part, IndexPart):
            if not isinstance(v, list):
                raise UnexpectedRhsEntry("index into non-array")
            idx = _resolve_read_index(part.op, path)
            if idx >= len(v):
                raise ArrIndexOutOfRange(idx, len(v))
            v = v[idx]
        elif isinstance(part, CompositeKeyPart):
            key = "".join(_entry_to_str(e, path) for e in part.entries)
            v = _key_into_object(v, key)
        else:  # KeyPart
            v = _key_into_object(v, _entry_to_str(part.entry, path))
    return v


def _resolve_read_index(op, path: list[Frame]) -> int:
    if isinstance(op, AmpIndex):
        return _parse_usize(_get_match(op.path_idx, op.match_idx, path))
    if isinstance(op, LiteralIndex):
        return op.value
    if isinstance(op, AtIndex):
        return _index_from_value(_eval_at(op.path_idx, op.rhs, path))
    raise UnexpectedRhsEntry("empty index op in read context")


def _index_from_value(val: Any) -> int:
    # Mirrors shift.rs:192-201: numbers must be non-negative integers
    # (serde's as_u64 — floats are rejected); strings parse as usize.
    if isinstance(val, bool):
        raise InvalidIndex(val)
    if isinstance(val, int):
        if val < 0:
            raise InvalidIndex(val)
        return val
    if isinstance(val, str):
        return _parse_usize(val)
    raise InvalidIndex(val)


def _parse_usize(s: str) -> int:
    t = s[1:] if s.startswith("+") else s
    if not t.isdigit() or not t.isascii():
        raise InvalidIndex(s)
    return int(t)


def _entry_to_str(entry, path: list[Frame]) -> str:
    if isinstance(entry, AmpEntry):
        return _get_match(entry.path_idx, entry.match_idx, path)
    if isinstance(entry, AtEntry):
        key = _eval_at(entry.path_idx, entry.rhs, path)
        if isinstance(key, bool):
            return "true" if key else "false"
        if isinstance(key, str):
            return key
        if isinstance(key, (int, float)):
            return number_to_string(key)
        raise EvalStringError()
    return entry.key  # KeyEntry


def _key_into_object(v: Any, key: str) -> Any:
    if not isinstance(v, dict):
        raise UnexpectedRhsEntry("key access into non-object")
    try:
        return v[key]
    except KeyError:
        raise KeyNotFound(key) from None


def _get_match(path_idx: int, match_idx: int, path: list[Frame]) -> str:
    if path_idx >= len(path):
        raise PathIndexOutOfRange(path_idx, len(path))
    captures = path[len(path) - path_idx - 1][0]
    if match_idx >= len(captures):
        raise MatchIndexOutOfRange(match_idx, len(captures))
    return captures[match_idx]


# ---- output writing ----


def _insert_val_to_rhs(rhs: Rhs, v: Any, path: list[Frame], out_box: list[Any]) -> None:
    """Navigate/create the output location then merge the value in
    (shift.rs:274-369). ``cont[slot]`` plays the role of the &mut out."""
    cont: Any = out_box
    slot: Any = 0

    for part in rhs.parts:
        cur = cont[slot]
        if isinstance(part, IndexPart):
            if isinstance(cur, list):
                arr = cur
            elif cur is None:
                arr = []
                cont[slot] = arr
            else:
                arr = [cur]
                cont[slot] = arr

            op = part.op
            if isinstance(op, EmptyIndex):
                arr.append(None)
                cont, slot = arr, len(arr) - 1
                continue
            if isinstance(op, AmpIndex):
                idx = _parse_usize(_get_match(op.path_idx, op.match_idx, path))
            elif isinstance(op, LiteralIndex):
                idx = op.value
            else:  # AtIndex
                idx = _index_from_value(_eval_at(op.path_idx, op.rhs, path))

            while len(arr) <= idx:
                arr.append(None)
            cont, slot = arr, idx
        else:
            if isinstance(part, CompositeKeyPart):
                key = "".join(_entry_to_str(e, path) for e in part.entries)
            else:  # KeyPart
                key = _entry_to_str(part.entry, path)

            if isinstance(cur, dict):
                target = cur
            else:
                target = {}
                cont[slot] = target
            if key not in target:
                target[key] = None
            cont, slot = target, key

    cur = cont[slot]
    if cur is None:
        cont[slot] = v
    elif isinstance(cur, list):
        cur.append(v)
    else:
        cont[slot] = [cur, v]


# ---- compiled write closures (performance only — semantics identical) ----


def compile_rhs_writer(rhs: Rhs):
    """Compile a write-side Rhs into a closure ``writer(v, path, out_box)``
    equivalent to ``_insert_val_to_rhs`` but with all per-part type
    dispatch resolved at spec-compile time. Index ops fall back to the
    generic interpreter (rare in hot specs). The 66-fixture golden gate
    plus dedicated unit tests pin equivalence."""
    steps = []
    for part in rhs.parts:
        if isinstance(part, KeyPart):
            e = part.entry
            if isinstance(e, KeyEntry):
                steps.append(("s", e.key))
            elif isinstance(e, AmpEntry):
                steps.append(("a", (e.path_idx, e.match_idx)))
            else:
                steps.append(("e", e))
        elif isinstance(part, CompositeKeyPart):
            steps.append(("c", part.entries))
        else:  # IndexPart → generic fallback
            return None

    if all(kind == "s" for kind, _ in steps):
        keys = tuple(arg for _, arg in steps)

        def static_writer(v, path, out_box, _keys=keys):
            cont, slot = out_box, 0
            for key in _keys:
                cur = cont[slot]
                if type(cur) is dict:
                    target = cur
                else:
                    target = {}
                    cont[slot] = target
                if key not in target:
                    target[key] = None
                cont, slot = target, key
            cur = cont[slot]
            if cur is None:
                cont[slot] = v
            elif type(cur) is list:
                cur.append(v)
            else:
                cont[slot] = [cur, v]

        return static_writer

    if len(steps) == 2 and steps[0][0] == "s" and steps[1][0] == "a":
        # `literal.&N` — the most common dynamic RHS shape (e.g. the
        # reference bench spec's `personal_details.&0`). Unrolled
        # two-level write, amp lookup inlined; byte-identical to the
        # generic interpreter on every collision/overwrite case.
        k0 = steps[0][1]
        p_idx, m_idx = steps[1][1]

        def static_amp_writer(v, path, out_box, _k0=k0, _p=p_idx, _m=m_idx):
            if _p >= len(path):
                raise PathIndexOutOfRange(_p, len(path))
            captures = path[-1 - _p][0]
            if _m >= len(captures):
                raise MatchIndexOutOfRange(_m, len(captures))
            key = captures[_m]

            cur = out_box[0]
            if type(cur) is dict:
                d0 = cur
            else:
                d0 = {}
                out_box[0] = d0
            mid = d0.get(_k0)
            if type(mid) is not dict:
                mid = {}
                d0[_k0] = mid
            cur = mid.get(key, _MISSING)
            if cur is None or cur is _MISSING:
                mid[key] = v
            elif type(cur) is list:
                cur.append(v)
            else:
                mid[key] = [cur, v]

        return static_amp_writer

    def keyed_writer(v, path, out_box, _steps=tuple(steps)):
        cont, slot = out_box, 0
        for kind, arg in _steps:
            if kind == "s":
                key = arg
            elif kind == "a":
                p_idx, m_idx = arg
                if p_idx >= len(path):
                    raise PathIndexOutOfRange(p_idx, len(path))
                captures = path[-1 - p_idx][0]
                if m_idx >= len(captures):
                    raise MatchIndexOutOfRange(m_idx, len(captures))
                key = captures[m_idx]
            elif kind == "e":
                key = _entry_to_str(arg, path)
            else:  # "c"
                key = "".join(_entry_to_str(e, path) for e in arg)
            cur = cont[slot]
            if type(cur) is dict:
                target = cur
            else:
                target = {}
                cont[slot] = target
            if key not in target:
                target[key] = None
            cont, slot = target, key
        cur = cont[slot]
        if cur is None:
            cont[slot] = v
        elif type(cur) is list:
            cur.append(v)
        else:
            cont[slot] = [cur, v]

    return keyed_writer


def write_rhs(rhs: Rhs, v: Any, path: list[Frame], out_box: list[Any]) -> None:
    w = rhs.writer
    if w is not None:
        w(v, path, out_box)
    else:
        _insert_val_to_rhs(rhs, v, path, out_box)


# ---- glob matching ----


def _match_stars(segments: list[str], k: str) -> Optional[list[str]]:
    """Match a key against a glob's literal segments; return the capture
    list (captures[0] = whole key) or None. Exact port of the reference
    algorithm including its non-consuming, non-anchored tail scan
    (shift.rs:371-433)."""
    n = len(segments)
    if n == 0:
        return [""] if k == "" else None
    if n == 1:
        return [k] if k == segments[0] else None

    m = [k]
    prefix = segments[0]
    if prefix:
        if not k.startswith(prefix):
            return None
        k = k[len(prefix):]

    for pattern in segments[1:]:
        if pattern:
            idx = k.find(pattern)
            if idx < 0:
                return None
            m.append(k[:idx])
            k = k[idx:]
        else:
            m.append(k)

    return m
