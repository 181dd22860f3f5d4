"""Regexp and JSON scalar functions over dictionary strings.

TPU-native form of ``Functions/FunctionsRegexpLike.h`` /
``FunctionsRegexpReplace.h`` / ``FunctionsJson.h``: patterns and paths are
literals (the reference's coprocessor pushdown also requires constant
patterns for its compiled-RE fast path), so every function is a host-side
transform over the column's dictionary applied on device as one gather —
the same trick as LIKE (``expr/compile.py:_like``).

Semantics follow MySQL/TiDB:
- match_type flags: i (case-insensitive), c (case-sensitive, wins over i),
  m (multi-line), n/s (dot matches newline); default case-sensitive
  (utf8mb4_bin collation).
- positions are 1-based; occurrence counts start at the pos offset.
- regexp_substr returns NULL on no match; regexp_instr returns 0.
- JSON path subset: $, .key, ."quoted key", [N]  ($[0] on a scalar is the
  scalar, as in MySQL).  Invalid JSON documents yield NULL (the reference
  raises; NULL keeps the whole-column LUT total).
"""

from __future__ import annotations

import base64
import json
import re
from typing import Any, List, Optional, Tuple


def compile_regexp(pattern: str, match_type: str = ""):
    flags = 0
    if "i" in match_type and "c" not in match_type:
        flags |= re.I
    if "m" in match_type:
        flags |= re.M
    if "n" in match_type or "s" in match_type:
        flags |= re.S
    return re.compile(pattern, flags)


def _match_iter(s: str, rx, pos: int):
    if pos < 1:
        raise ValueError("regexp position must be >= 1")
    return rx.finditer(s, pos - 1)


def regexp_like(s: str, pattern: str, match_type: str = "") -> bool:
    return compile_regexp(pattern, match_type).search(s) is not None


def regexp_instr(s: str, pattern: str, pos: int = 1, occurrence: int = 1,
                 return_option: int = 0, match_type: str = "") -> int:
    rx = compile_regexp(pattern, match_type)
    for i, m in enumerate(_match_iter(s, rx, int(pos)), start=1):
        if i == int(occurrence):
            return (m.end() + 1) if int(return_option) else (m.start() + 1)
    return 0


def regexp_substr(s: str, pattern: str, pos: int = 1, occurrence: int = 1,
                  match_type: str = "") -> Optional[str]:
    rx = compile_regexp(pattern, match_type)
    for i, m in enumerate(_match_iter(s, rx, int(pos)), start=1):
        if i == int(occurrence):
            return m.group(0)
    return None


def regexp_replace(s: str, pattern: str, repl: str, pos: int = 1,
                   occurrence: int = 0, match_type: str = "") -> str:
    """occurrence 0 = replace all matches from ``pos``.  ``repl`` is
    literal (MySQL does not support backreferences in repl)."""
    if pos < 1:
        raise ValueError("regexp position must be >= 1")
    rx = compile_regexp(pattern, match_type)
    head, tail = s[: int(pos) - 1], s[int(pos) - 1:]
    if int(occurrence) == 0:
        return head + rx.sub(lambda m: repl, tail)
    out, last, count = [], 0, 0
    for m in rx.finditer(tail):
        count += 1
        if count == int(occurrence):
            out.append(tail[last:m.start()])
            out.append(repl)
            last = m.end()
            break
    out.append(tail[last:])
    return head + "".join(out)


# ---------------------------------------------------------------------------
# JSON
# ---------------------------------------------------------------------------

PathStep = Tuple[str, Any]  # ('key', name) | ('idx', i)


def parse_json_path(path: str) -> List[PathStep]:
    if not path.startswith("$"):
        raise ValueError(f"JSON path must start with '$': {path!r}")
    i, steps = 1, []
    while i < len(path):
        c = path[i]
        if c == ".":
            i += 1
            if i < len(path) and path[i] == '"':
                j = path.index('"', i + 1)
                steps.append(("key", path[i + 1: j]))
                i = j + 1
            else:
                j = i
                while j < len(path) and (path[j].isalnum() or path[j] == "_"):
                    j += 1
                if j == i:
                    raise ValueError(f"bad JSON path member at {i}: {path!r}")
                steps.append(("key", path[i:j]))
                i = j
        elif c == "[":
            j = path.index("]", i)
            steps.append(("idx", int(path[i + 1: j])))
            i = j + 1
        else:
            raise ValueError(f"bad JSON path at {i}: {path!r}")
    return steps


_MISSING = object()


def _json_navigate(doc: str, steps: List[PathStep]):
    """Returns the addressed value, _MISSING if absent, or _MISSING if the
    document is not valid JSON."""
    try:
        v = json.loads(doc)
    except Exception:
        return _MISSING
    for kind, k in steps:
        if kind == "key":
            if isinstance(v, dict) and k in v:
                v = v[k]
            else:
                return _MISSING
        else:
            if isinstance(v, list):
                if 0 <= k < len(v):
                    v = v[k]
                else:
                    return _MISSING
            elif k == 0:
                pass  # MySQL: $[0] on a scalar addresses the scalar
            else:
                return _MISSING
    return v


def json_dumps_mysql(v: Any) -> str:
    """MySQL-style JSON text: ", " / ": " separators, utf-8 kept raw."""
    return json.dumps(v, separators=(", ", ": "), ensure_ascii=False)


def json_extract(doc: str, path: str) -> Optional[str]:
    v = _json_navigate(doc, parse_json_path(path))
    if v is _MISSING:
        return None
    return json_dumps_mysql(v)


def json_unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        try:
            v = json.loads(s)
            if isinstance(v, str):
                return v
        except Exception:
            pass
    return s


def json_type(doc: str) -> Optional[str]:
    try:
        v = json.loads(doc)
    except Exception:
        return None
    if isinstance(v, dict):
        return "OBJECT"
    if isinstance(v, list):
        return "ARRAY"
    if isinstance(v, str):
        return "STRING"
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "INTEGER"
    if isinstance(v, float):
        return "DOUBLE"
    return "NULL"


def json_valid(s: str) -> bool:
    try:
        json.loads(s)
        return True
    except Exception:
        return False


def json_length(doc: str, path: str = "$") -> Optional[int]:
    v = _json_navigate(doc, parse_json_path(path))
    if v is _MISSING:
        return None
    if isinstance(v, dict) or isinstance(v, list):
        return len(v)
    return 1


def json_depth(doc: str) -> Optional[int]:
    try:
        v = json.loads(doc)
    except Exception:
        return None

    def depth(x):
        if isinstance(x, dict):
            return 1 + max((depth(c) for c in x.values()), default=0)
        if isinstance(x, list):
            return 1 + max((depth(c) for c in x), default=0)
        return 1

    return depth(v)


def json_contains_path(doc: str, one_or_all: str, *paths: str) -> Optional[bool]:
    hits = []
    for p in paths:
        v = _json_navigate(doc, parse_json_path(p))
        hits.append(v is not _MISSING)
    try:
        json.loads(doc)
    except Exception:
        return None
    return all(hits) if str(one_or_all).lower() == "all" else any(hits)


# ---------------------------------------------------------------------------
# misc string codecs (FunctionsString.h breadth)
# ---------------------------------------------------------------------------


def to_base64(s: str) -> str:
    enc = base64.b64encode(s.encode()).decode()
    return "\n".join(enc[i: i + 76] for i in range(0, len(enc), 76))


def from_base64(s: str) -> Optional[str]:
    try:
        return base64.b64decode(s.replace("\n", ""), validate=True).decode()
    except Exception:
        return None


def unhex(s: str) -> Optional[str]:
    try:
        return bytes.fromhex(s).decode("latin-1")
    except Exception:
        return None


def quote(s: str) -> str:
    out = s.replace("\\", "\\\\").replace("'", "\\'")
    out = out.replace("\0", "\\0").replace("\x1a", "\\Z")
    return "'" + out + "'"


def soundex(s: str) -> str:
    codes = {**dict.fromkeys("BFPV", "1"), **dict.fromkeys("CGJKQSXZ", "2"),
             **dict.fromkeys("DT", "3"), "L": "4",
             **dict.fromkeys("MN", "5"), "R": "6"}
    letters = [c for c in s.upper() if c.isalpha()]
    if not letters:
        return ""
    head = letters[0]
    out, prev = [head], codes.get(head, "")
    for c in letters[1:]:
        code = codes.get(c, "")
        if code and code != prev:
            out.append(code)
        if c not in "HW":
            prev = code
    return ("".join(out) + "000")[:4] if len(out) < 4 else "".join(out)


def conv(s: str, from_base: int, to_base: int) -> Optional[str]:
    """MySQL CONV: parse the longest valid prefix in from_base; NULL only
    for unsupported bases."""
    fb, tb = int(from_base), int(to_base)
    if not (2 <= fb <= 36 and 2 <= abs(tb) <= 36):
        return None
    t = s.strip()
    neg = t.startswith("-")
    if neg or t.startswith("+"):
        t = t[1:]
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:fb]
    val = 0
    seen = False
    for ch in t.lower():
        if ch not in digits:
            break
        val = val * fb + digits.index(ch)
        seen = True
    if not seen:
        return "0"
    if neg:
        val = -val
    # MySQL treats the value as unsigned 64-bit unless to_base < 0
    if tb > 0 and val < 0:
        val += 1 << 64
    sign = ""
    if tb < 0 and val < 0:
        sign, val = "-", -val
    tb = abs(tb)
    if val == 0:
        return "0"
    out = []
    alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    while val:
        out.append(alphabet[val % tb])
        val //= tb
    return sign + "".join(reversed(out))
