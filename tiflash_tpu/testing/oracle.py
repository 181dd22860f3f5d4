"""Independent row-at-a-time reference executor ("the oracle").

Role analog: the expected-result side of the reference's executor tests
(``TestUtils/ExecutorTestUtils.h:62`` ``executeAndAssertColumnsEqual`` and
the ``tests/fullstack-test`` expected tables).  Deliberately written as
naive Python loops over native values (``decimal.Decimal`` for decimals,
``None`` for NULL) with **no shared code** with the engine, so a semantic
bug in the engine cannot hide in the oracle.

Tables here are ``{name: [python values]}``; the helpers convert engine
Blocks to the same shape for comparison.
"""

from __future__ import annotations

import datetime
import fractions
import decimal
import math
import re
from decimal import Decimal as D
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.block import Block
from ..core.dtypes import DataType, TypeKind
from ..expr.nodes import Call, ColumnRef, Expr, Literal

PyTable = Dict[str, List[Any]]

_CTX = decimal.Context(prec=90, rounding=decimal.ROUND_HALF_UP)
# 90 > 65 + 20: a decimal(65, s) mantissa shifted by any scale stays
# exact (python's DEFAULT context is prec-28 and silently rounds 65-digit
# mantissas — never use bare decimal arithmetic on wide values)


# ---------------------------------------------------------------------------
# engine block -> python values
# ---------------------------------------------------------------------------


def block_to_pytable(block: Block) -> PyTable:
    raw = block.to_pylists()
    out: PyTable = {}
    for name, col in zip(block.names, block.columns):
        vals = raw[name]
        if col.dtype.is_decimal:
            # scaleb under the prec-38 context: exact exponent shift for
            # wide-decimal mantissas (the default prec-28 context rounds)
            vals = [None if v is None
                    else D(v).scaleb(-col.dtype.scale, context=_CTX)
                    for v in vals]
        elif col.dtype.kind is TypeKind.DATE:
            from ..core.dtypes import (ZERO_DATE_DAYS, CivilDate, ZeroDate,
                                       days_to_civil)

            def _d(v):
                from ..core.dtypes import (is_partial_zero_days,
                                           partial_zero_civil)

                if v is None:
                    return None
                if v == ZERO_DATE_DAYS:
                    return ZeroDate()
                if is_partial_zero_days(int(v)):
                    return CivilDate(*partial_zero_civil(int(v)))
                try:
                    return (datetime.date(1970, 1, 1)
                            + datetime.timedelta(days=int(v)))
                except OverflowError:  # year 0 / year 10000+
                    return CivilDate(*days_to_civil(int(v)))
            vals = [_d(v) for v in vals]
        elif col.dtype.kind is TypeKind.DATETIME:
            from ..core.dtypes import (ZERO_DT_BASE_US, CivilDateTime,
                                       ZeroDateTime, days_to_civil)

            def _dt(v):
                if v is None:
                    return None
                if ZERO_DT_BASE_US <= v < ZERO_DT_BASE_US + 86_400_000_000:
                    return ZeroDateTime(v - ZERO_DT_BASE_US)
                try:
                    return (datetime.datetime(1970, 1, 1)
                            + datetime.timedelta(microseconds=v))
                except OverflowError:  # year 0 / year 10000+
                    days, tod = divmod(int(v), 86_400_000_000)
                    y, m, d = days_to_civil(days)
                    s, us = divmod(tod, 1_000_000)
                    mi, s = divmod(s, 60)
                    hh, mi = divmod(mi, 60)
                    return CivilDateTime(y, m, d, hh, mi, s, us)
            vals = [_dt(v) for v in vals]
        elif col.dtype.kind is TypeKind.BOOL:
            vals = [None if v is None else bool(v) for v in vals]
        out[name] = vals
    return out


def sort_pytable(t: PyTable) -> PyTable:
    """Canonical row order for orderless comparison."""
    names = list(t.keys())
    rows = list(zip(*[t[n] for n in names]))
    rows.sort(key=lambda r: tuple((v is None, str(type(v)), v) for v in r))
    return {n: [r[i] for r in rows] for i, n in enumerate(names)}


def assert_tables_equal(actual: PyTable, expected: PyTable, *, ordered=False, approx_cols=()):
    assert set(actual) == set(expected), (sorted(actual), sorted(expected))
    a = actual if ordered else sort_pytable(actual)
    e = expected if ordered else sort_pytable(expected)
    for name in e:
        av, ev = a[name], e[name]
        assert len(av) == len(ev), f"{name}: {len(av)} rows vs {len(ev)}"
        for i, (x, y) in enumerate(zip(av, ev)):
            if name in approx_cols and x is not None and y is not None:
                assert math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9), (
                    name, i, x, y)
            else:
                assert _py_eq(x, y), f"{name}[{i}]: {x!r} != {y!r}"


def _oracle_cast(v, target) -> Any:
    """Independent CAST semantics mirror (MySQL coercion subset)."""
    if v is None:
        return None
    if isinstance(v, str):
        if target.kind in (TypeKind.DATE, TypeKind.DATETIME):
            s = v.strip().replace("/", "-")
            for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                        "%Y-%m-%d %H:%M", "%Y-%m-%d", "%Y%m%d"):
                try:
                    t = datetime.datetime.strptime(s, fmt)
                    return t.date() if target.kind is TypeKind.DATE else t
                except ValueError:
                    continue
            return None
        m = re.match(r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", v)
        v = float(m.group(0)) if m else 0.0
    if isinstance(v, datetime.datetime) and target.kind is TypeKind.DATE:
        return v.date()
    if isinstance(v, datetime.date) and target.kind is TypeKind.DATETIME:
        return datetime.datetime(v.year, v.month, v.day)
    if target.kind is TypeKind.BOOL:
        return float(v) != 0
    if target.is_decimal:
        q = D(1).scaleb(-target.scale)
        return D(repr(float(v))).quantize(q, rounding=decimal.ROUND_HALF_UP)
    if target.is_float:
        return float(v)
    if target.is_integer:
        f = float(v)
        return int(math.copysign(math.floor(abs(f) + 0.5), f))
    raise KeyError(f"oracle cast -> {target}")


def _py_eq(x, y) -> bool:
    if x is None or y is None:
        return x is None and y is None
    if isinstance(x, D) or isinstance(y, D):
        return D(x) == D(y)
    if isinstance(x, float) or isinstance(y, float):
        return math.isclose(float(x), float(y), rel_tol=1e-12, abs_tol=1e-12)
    return x == y


# ---------------------------------------------------------------------------
# oracle expression evaluation (row at a time)
# ---------------------------------------------------------------------------


def eval_expr_row(expr: Expr, row: Dict[str, Any]) -> Any:
    from ..expr.nodes import Cast as _Cast

    if isinstance(expr, ColumnRef):
        return row[expr.name]
    if isinstance(expr, Literal):
        v = expr.value
        if isinstance(v, float):
            return v
        return v
    if isinstance(expr, _Cast):
        return _oracle_cast(eval_expr_row(expr.arg, row), expr.target)
    assert isinstance(expr, Call)
    f = expr.func
    args = expr.args

    if f in ("and", "or"):
        a = _as_bool(eval_expr_row(args[0], row))
        b = _as_bool(eval_expr_row(args[1], row))
        if f == "and":
            if a is False or b is False:
                return False
            if a is None or b is None:
                return None
            return True
        if a is True or b is True:
            return True
        if a is None or b is None:
            return None
        return False
    if f == "not":
        a = _as_bool(eval_expr_row(args[0], row))
        return None if a is None else (not a)
    if f == "is_null":
        return eval_expr_row(args[0], row) is None
    if f == "is_not_null":
        return eval_expr_row(args[0], row) is not None
    if f == "if":
        c = _as_bool(eval_expr_row(args[0], row))
        return eval_expr_row(args[1] if c else args[2], row)
    if f == "coalesce":
        for a in args:
            v = eval_expr_row(a, row)
            if v is not None:
                return v
        return None
    if f == "case_when":
        pairs = args[:-1] if len(args) % 2 == 1 else args
        for i in range(0, len(pairs), 2):
            if _as_bool(eval_expr_row(pairs[i], row)):
                return eval_expr_row(pairs[i + 1], row)
        return eval_expr_row(args[-1], row) if len(args) % 2 == 1 else None
    if f == "in":
        # MySQL three-valued IN: TRUE on match, NULL when unmatched and
        # the probe or any list element is NULL, else FALSE
        v = eval_expr_row(args[0], row)
        if v is None:
            return None
        vs = [eval_expr_row(a, row) for a in args[1:]]
        if any(x == v for x in vs if x is not None):
            return True
        return None if any(x is None for x in vs) else False
    if f in ("like", "ilike"):
        v = eval_expr_row(args[0], row)
        if v is None:
            return None
        pat = eval_expr_row(args[1], row)
        if pat is None:
            return None
        pat = str(pat)
        esc = "\\"
        if len(args) > 2:
            ev = args[2].value
            esc = chr(ev) if isinstance(ev, int) else str(ev)
        if f == "ilike":
            # TiDB ILIKE folds ASCII case only ('ü' != 'Ü')
            tbl = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                                "abcdefghijklmnopqrstuvwxyz")
            v, pat = str(v).translate(tbl), pat.translate(tbl)
        parts, i = [], 0
        while i < len(pat):
            c = pat[i]
            if c == esc and i + 1 < len(pat):
                parts.append(re.escape(pat[i + 1]))
                i += 2
                continue
            parts.append(".*" if c == "%" else "." if c == "_" else re.escape(c))
            i += 1
        rx = re.compile("".join(parts), re.S)
        return rx.fullmatch(str(v)) is not None
    if f == "null_eq":
        va = eval_expr_row(args[0], row)
        vb = eval_expr_row(args[1], row)
        if va is None or vb is None:
            return va is None and vb is None
        return bool(eval_expr_row(Call("equals", args), row))

    # functions with non-default NULL semantics (evaluated before the
    # generic NULL-propagation gate below)
    if f == "pi":
        return math.pi
    if f in ("is_not_true", "is_not_false"):
        v = _as_bool(eval_expr_row(args[0], row))
        return not (v is True) if f == "is_not_true" else not (v is False)
    if f == "interval":
        n = eval_expr_row(args[0], row)
        if n is None:
            return -1  # MySQL quirk: INTERVAL(NULL, ...) is -1, not NULL
        rest = [eval_expr_row(a, row) for a in args[1:]]
        return sum(1 for v in rest if v is not None and float(v) <= float(n))
    if f == "concat_ws":
        sep = eval_expr_row(args[0], row)
        if sep is None:  # MySQL: NULL separator -> NULL; NULL pieces skip
            return None
        pieces = [eval_expr_row(a, row) for a in args[1:]]
        return str(sep).join(str(p) for p in pieces if p is not None)
    if f == "elt":
        # only the index and the SELECTED item decide NULL-ness
        n = eval_expr_row(args[0], row)
        if n is None:
            return None
        n = int(n)
        if not (1 <= n <= len(args) - 1):
            return None
        return eval_expr_row(args[n], row)
    if f in ("json_array", "json_object"):
        # SQL NULL embeds as a JSON null element: JSON_ARRAY(NULL) =
        # '[null]' (matches MySQL; literal and column NULLs alike)
        vs = [eval_expr_row(a2, row) for a2 in args]
        if f == "json_array":
            doc = vs
        else:
            doc = {str(vs[i]): vs[i + 1] for i in range(0, len(vs), 2)}
        import json as _json

        def dump(v):
            # MySQL binary-JSON object key order: length, then bytes
            if isinstance(v, dict):
                its = sorted(v.items(), key=lambda kv: (len(kv[0]), kv[0]))
                return "{" + ", ".join(
                    f"{_json.dumps(k, ensure_ascii=False)}: {dump(x)}"
                    for k, x in its) + "}"
            if isinstance(v, (list, tuple)):
                return "[" + ", ".join(dump(x) for x in v) + "]"
            return _json.dumps(v, ensure_ascii=False)

        return dump(doc)
    if f == "extract":
        unit = str(args[0].value).upper()
        d0 = eval_expr_row(args[1], row)
        if d0 is None:
            return None
        if unit == "WEEK":
            return eval_expr_row(Call("week", (args[1],)), row)
        dtv = d0 if isinstance(d0, datetime.datetime) else \
            datetime.datetime(d0.year, d0.month, d0.day)
        part = {
            "YEAR": dtv.year, "QUARTER": (dtv.month + 2) // 3,
            "MONTH": dtv.month, "DAY": dtv.day, "HOUR": dtv.hour,
            "MINUTE": dtv.minute, "SECOND": dtv.second,
            "MICROSECOND": dtv.microsecond,
            "YEAR_MONTH": dtv.year * 100 + dtv.month,
            "DAY_HOUR": dtv.day * 100 + dtv.hour,
            "DAY_MINUTE": dtv.day * 10_000 + dtv.hour * 100 + dtv.minute,
            "DAY_SECOND": dtv.day * 1_000_000 + dtv.hour * 10_000
            + dtv.minute * 100 + dtv.second,
            "HOUR_MINUTE": dtv.hour * 100 + dtv.minute,
            "HOUR_SECOND": dtv.hour * 10_000 + dtv.minute * 100 + dtv.second,
            "MINUTE_SECOND": dtv.minute * 100 + dtv.second,
            "SECOND_MICROSECOND": dtv.second * 1_000_000 + dtv.microsecond,
            "MINUTE_MICROSECOND": dtv.minute * 100_000_000
            + dtv.second * 1_000_000 + dtv.microsecond,
            "HOUR_MICROSECOND": dtv.hour * 10_000_000_000
            + dtv.minute * 100_000_000 + dtv.second * 1_000_000
            + dtv.microsecond,
            "DAY_MICROSECOND": dtv.day * 1_000_000_000_000
            + dtv.hour * 10_000_000_000 + dtv.minute * 100_000_000
            + dtv.second * 1_000_000 + dtv.microsecond,
        }.get(unit)
        if part is None:
            raise KeyError(f"oracle: EXTRACT unit {unit}")
        return part
    if f == "timestampdiff":
        unit = str(args[0].value).upper()
        A = eval_expr_row(args[1], row)
        B = eval_expr_row(args[2], row)
        if A is None or B is None:
            return None
        return _oracle_timestampdiff(unit, A, B)
    if f == "date_format":
        d0 = eval_expr_row(args[0], row)
        if d0 is None:
            return None
        return _oracle_date_format(d0, str(args[1].value))
    # TiDB-name aliases the engine resolves in its compiler
    if f in ("adddate", "subdate") and len(args) == 3:
        f = "date_add" if f == "adddate" else "date_sub"
    f = {"substr": "substring", "mid": "substring",
         "adddate": "date_add_days", "subdate": "date_sub_days",
         "add_months": "date_add_months", "bit_neg": "bit_not",
         "json_array_length": "json_length", "sha": "sha1",
         "day": "day_of_month", "div": "int_div",
         "intdiv": "int_div"}.get(f, f)

    vals = [eval_expr_row(a, row) for a in args]
    if any(v is None for v in vals):
        return None  # default NULL propagation for every remaining function

    a = vals[0]
    b = vals[1] if len(vals) > 1 else None
    # date vs literal string coercion; an INVALID date literal makes
    # the comparison NULL (MySQL: DATE vs '0' -> NULL with a warning)
    try:
        if isinstance(a, datetime.date) and isinstance(b, str):
            b = datetime.date.fromisoformat(b)
        if isinstance(b, datetime.date) and isinstance(a, str):
            a = datetime.date.fromisoformat(a)
    except ValueError:
        if f in ("equals", "not_equals", "less", "less_or_equals",
                 "greater", "greater_or_equals", "null_eq"):
            return None
        raise
    # temporal vs NUMBER comparisons run in the temporal's NUMERIC form
    # (MySQL: DATETIME -> yyyymmddhhmmss[.ffffff], DATE -> yyyymmdd)
    if f in ("equals", "not_equals", "less", "less_or_equals",
             "greater", "greater_or_equals", "null_eq"):

        def _tnum(x):
            if isinstance(x, datetime.datetime):
                v = (x.year * 10**10 + x.month * 10**8 + x.day * 10**6
                     + x.hour * 10**4 + x.minute * 100 + x.second)
                return v + x.microsecond / 1e6 if x.microsecond else v
            if isinstance(x, datetime.date):
                return x.year * 10**4 + x.month * 100 + x.day
            return x

        if isinstance(a, datetime.date) and isinstance(b, (int, float, D)):
            a = _tnum(a)
        elif isinstance(b, datetime.date) and isinstance(a, (int, float, D)):
            b = _tnum(b)
        # string vs NUMBER compares as DOUBLE (lax numeric prefix)
        import re as _re

        def _laxnum(s):
            m2 = _re.match(r"\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?",
                           s)
            return float(m2.group(0)) if m2 else 0.0

        if isinstance(a, str) and isinstance(b, (int, float, D)):
            a, b = _laxnum(a), float(b)
        elif isinstance(b, str) and isinstance(a, (int, float, D)):
            a, b = float(a), _laxnum(b)
    # float literal in decimal context -> exact decimal (mirrors TiDB
    # parsing decimal literals as decimals, engine _float_to_decimal)
    if isinstance(a, D) and isinstance(b, float):
        b = D(repr(b))
    if isinstance(b, D) and isinstance(a, float):
        a = D(repr(a))
    a, b = _numify(a), _numify(b)
    if f == "plus":
        return a + b
    if f == "minus":
        return a - b
    if f == "multiply":
        return a * b
    if f == "divide":
        if b == 0:
            return None
        if isinstance(a, D) or isinstance(b, D) or isinstance(a, int):
            da, db = D(a), D(b)
            scale = -da.as_tuple().exponent if da.as_tuple().exponent < 0 else 0
            return _CTX.divide(da, db).quantize(
                D(1).scaleb(-(scale + 4)), context=_CTX
            )
        return a / b
    if f == "int_div":
        if b == 0:
            return None
        # MySQL DIV truncates toward zero: -5 DIV 3 = -1 (python //
        # floors to -2).  Exact for ints (arbitrary precision); for
        # float/Decimal args Fraction keeps the quotient exact before
        # truncation.
        if isinstance(a, int) and isinstance(b, int):
            q = abs(a) // abs(b)
            return -q if (a < 0) != (b < 0) else q
        fa = fractions.Fraction(a if not isinstance(a, D) else str(a))
        fb = fractions.Fraction(b if not isinstance(b, D) else str(b))
        q = abs(fa) / abs(fb)
        q = int(q)  # Fraction.__int__ truncates toward zero
        return -q if (fa < 0) != (fb < 0) else q
    if f == "modulo":
        if b == 0:
            return None
        if isinstance(a, float) or isinstance(b, float):
            return math.fmod(a, b)
        if isinstance(a, D) or isinstance(b, D):
            # decimal MOD keeps the fraction and the dividend's sign
            # (MOD(7.5, 2) = 1.5); Context.remainder truncates
            return _CTX.remainder(a if isinstance(a, D) else D(a),
                                  b if isinstance(b, D) else D(b))
        # pure-int: copysign would roundtrip through float (loses
        # precision past 2^53 — INT64_MIN % 5 must stay exact)
        r = abs(int(a)) % abs(int(b))
        return -r if a < 0 else r
    if f == "negate":
        return -a
    if f == "abs":
        return abs(a)
    if f in ("equals", "not_equals", "less", "less_or_equals", "greater", "greater_or_equals"):
        cmp = {
            "equals": lambda: a == b,
            "not_equals": lambda: a != b,
            "less": lambda: a < b,
            "less_or_equals": lambda: a <= b,
            "greater": lambda: a > b,
            "greater_or_equals": lambda: a >= b,
        }[f]
        return cmp()
    if f in ("year", "month", "day_of_month"):
        d = a if isinstance(a, datetime.date) else a
        return {"year": d.year, "month": d.month, "day_of_month": d.day}[f]
    if f == "date":
        return a.date() if isinstance(a, datetime.datetime) else a
    if f == "make_set":
        u = int(a) if a >= 0 else int(a) + (1 << 64)
        return ",".join(str(s) for i, s in enumerate(vals[1:]) if u & (1 << i))
    if f == "export_set":
        u = int(a) if a >= 0 else int(a) + (1 << 64)
        on, off = str(vals[1]), str(vals[2])
        sep = str(vals[3]) if len(vals) > 3 else ","
        nb = int(vals[4]) if len(vals) > 4 else 64
        return sep.join(on if u & (1 << i) else off for i in range(nb))

    # math
    if f in ("sqrt", "ln", "log", "log2", "log10"):
        x = float(a)
        if f == "sqrt":
            return math.sqrt(x) if x >= 0 else None
        if x <= 0:
            return None
        return {"ln": math.log, "log": math.log, "log2": math.log2,
                "log10": math.log10}[f](x)
    if f == "exp":
        return math.exp(float(a))
    if f == "exp2":
        return float(2.0 ** float(a))
    if f in ("sin", "cos", "tan"):
        return getattr(math, f)(float(a))
    if f == "radians":
        return math.radians(float(a))
    if f == "degrees":
        return math.degrees(float(a))
    if f == "pow":
        return float(a) ** float(b)
    if f == "sign":
        return (a > 0) - (a < 0)
    if f in ("round", "floor", "ceil", "truncate") and b is not None:
        d = int(b)

        def red(x, mode):
            half = D("0.5") if isinstance(x, D) else 0.5
            if mode == "round":
                if isinstance(x, float):
                    return round(x)  # approximate types: half to even
                return math.floor(x + half) if x >= 0 else math.ceil(x - half)
            if mode == "floor":
                return math.floor(x)
            if mode == "ceil":
                return math.ceil(x)
            return math.trunc(x)

        if isinstance(a, D):
            s = -a.as_tuple().exponent if a.as_tuple().exponent < 0 else 0
            ns = max(min(d, s), 0)
            scaled = red(a.scaleb(min(d, s), context=_CTX), f)
            v = D(scaled).scaleb(-min(d, s), context=_CTX)
            return v.quantize(D(1).scaleb(-ns, context=_CTX),
                              context=_CTX)
        if isinstance(a, float):
            fct = 10.0 ** max(min(d, 307), -307)  # |d|>307 can't move f64
            s = a * fct
            if not math.isfinite(s):
                return a  # rounding position beyond the value: no-op
            return red(s, f) / fct
        u = int(a)
        if d >= 0:
            return u
        q = 10 ** (-d)
        # exact integer arithmetic: u/q as float would take the
        # approximate-type half-to-even rule, but integers are EXACT
        # (ROUND(125, -1) = 130, half away from zero)
        if f == "round":
            r = (abs(u) + q // 2) // q * q
            return -r if u < 0 else r
        if f == "truncate":
            r = abs(u) // q * q
            return -r if u < 0 else r
        if f == "floor":
            return (u // q) * q
        return -((-u) // q) * q  # ceil
    if f in ("round", "floor", "ceil", "truncate"):
        if isinstance(a, D):
            if f == "round":
                return int(a.quantize(D(1), rounding=decimal.ROUND_HALF_UP))
            if f == "floor":
                return int(math.floor(a))
            if f == "ceil":
                return int(math.ceil(a))
            return int(a.to_integral_value(rounding=decimal.ROUND_DOWN))
        if isinstance(a, float):
            if f == "round":
                return round(a)  # approximate types: half to even
            return {"floor": math.floor, "ceil": math.ceil,
                    "truncate": math.trunc}[f](a)
        return int(a)
    if f == "greatest":
        return max(vals)
    if f == "least":
        return min(vals)
    if f == "nullif":
        return None if a == b else a

    # date
    if f == "date_add_days":
        return a + datetime.timedelta(days=int(b))
    if f == "date_sub_days":
        return a - datetime.timedelta(days=int(b))
    if f == "datediff":
        return (a - b).days
    if f == "day_of_week":
        return a.isoweekday() % 7 + 1
    if f == "day_of_year":
        return a.timetuple().tm_yday
    if f == "quarter":
        return (a.month + 2) // 3
    if f == "to_days":
        return (a - datetime.date(1970, 1, 1)).days + 719528
    if f == "week_of_year":
        return a.isocalendar()[1]
    if f == "last_day":
        nm = datetime.date(a.year + (a.month == 12), a.month % 12 + 1, 1)
        return nm - datetime.timedelta(days=1)
    if f == "weekday":
        return a.weekday()
    if f == "week":
        jan1 = datetime.date(a.year, 1, 1)
        fs = 1 + (6 - jan1.weekday()) % 7  # doy of the first Sunday
        doy = a.timetuple().tm_yday
        return 0 if doy < fs else (doy - fs) // 7 + 1
    if f == "yearweek":
        d0 = a.date() if isinstance(a, datetime.datetime) else a
        # the Sunday starting a's week; its year owns the week
        s = d0 - datetime.timedelta(days=(d0.weekday() + 1) % 7)
        jan1 = datetime.date(s.year, 1, 1)
        fs = jan1 + datetime.timedelta(days=(6 - jan1.weekday()) % 7)
        return s.year * 100 + (s - fs).days // 7 + 1
    if f == "from_days":
        return datetime.date.fromordinal(int(a) - 365)
    if f == "makedate":
        if int(b) < 1:
            return None
        return datetime.date(int(a), 1, 1) + datetime.timedelta(days=int(b) - 1)
    if f == "time_to_sec":
        if isinstance(a, datetime.datetime):
            return a.hour * 3600 + a.minute * 60 + a.second
        return 0
    if f in ("period_add", "period_diff"):
        def months_of(p):
            y, m = divmod(int(p), 100)
            if y < 70:
                y += 2000
            elif y < 100:
                y += 1900
            return y * 12 + m - 1
        if f == "period_add":
            t = months_of(a) + int(b)
            return (t // 12) * 100 + t % 12 + 1
        return months_of(a) - months_of(b)
    if f in ("date_add_months", "date_sub_months",
             "date_add_years", "date_sub_years",
             "date_add_quarters", "date_sub_quarters"):
        n = int(b) * (12 if "years" in f else 3 if "quarters" in f else 1) \
            * (-1 if "sub" in f else 1)
        return _oracle_add_months(a, n)
    if f in ("date_add_weeks", "date_sub_weeks"):
        return a + datetime.timedelta(weeks=int(b) * (-1 if "sub" in f else 1))
    if f.startswith(("date_add_", "date_sub_")) and f.split("_")[-1] in (
            "hours", "minutes", "seconds", "microseconds"):
        unit = f.split("_")[-1]
        mult = {"hours": 3_600_000_000, "minutes": 60_000_000,
                "seconds": 1_000_000, "microseconds": 1}[unit]
        base = a if isinstance(a, datetime.datetime) else \
            datetime.datetime(a.year, a.month, a.day)
        n = int(b) * (-1 if "sub" in f else 1)
        return base + datetime.timedelta(microseconds=n * mult)
    if f in ("date_add", "date_sub"):
        unit = str(vals[2]).upper()
        n = int(b) * (-1 if f == "date_sub" else 1)
        if unit == "DAY":
            return a + datetime.timedelta(days=n)
        if unit == "WEEK":
            return a + datetime.timedelta(weeks=n)
        if unit in ("MONTH", "QUARTER", "YEAR"):
            return _oracle_add_months(
                a, n * {"MONTH": 1, "QUARTER": 3, "YEAR": 12}[unit])
        mult = {"HOUR": 3_600_000_000, "MINUTE": 60_000_000,
                "SECOND": 1_000_000, "MICROSECOND": 1}[unit]
        base = a if isinstance(a, datetime.datetime) else \
            datetime.datetime(a.year, a.month, a.day)
        return base + datetime.timedelta(microseconds=n * mult)
    if f.startswith("vec_"):
        va = [float(x) for x in a]
        if f == "vec_dims":
            return len(va)
        if f == "vec_l2_norm":
            return math.sqrt(sum(x * x for x in va))
        vb = [float(x) for x in b]
        if len(va) != len(vb):
            raise ValueError("oracle: vector dims mismatch")
        if f == "vec_l2_distance":
            return math.sqrt(sum((x - y) ** 2 for x, y in zip(va, vb)))
        if f == "vec_l1_distance":
            return sum(abs(x - y) for x, y in zip(va, vb))
        if f == "vec_negative_inner_product":
            return -sum(x * y for x, y in zip(va, vb))
        if f == "vec_cosine_distance":
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(y * y for y in vb))
            if na == 0 or nb == 0:
                return None
            return 1.0 - sum(x * y for x, y in zip(va, vb)) / (na * nb)
        raise KeyError(f"oracle: vector function {f}")
    if f == "grouping":
        return int(all(int(a) != int(v) for v in vals[1:]))
    if f in ("grouping_bit_and", "grouping_cmp"):
        res = 0
        for v in vals[1:]:
            res = res * 2 + (
                (int(a) & int(v)) == 0 if f == "grouping_bit_and"
                else int(a) <= int(v))
        return res
    if f == "bit_count":
        return bin(int(a) & ((1 << 64) - 1)).count("1")
    if f == "xor":
        return bool(a) != bool(b)
    if f == "elt":
        n, rest = int(a), vals[1:]
        return rest[n - 1] if 1 <= n <= len(rest) else None
    if f == "ord":
        return int.from_bytes(a[0].encode(), "big") if a else 0
    if f == "sha2":
        import hashlib
        algo = {0: hashlib.sha256, 224: hashlib.sha224, 256: hashlib.sha256,
                384: hashlib.sha384, 512: hashlib.sha512}.get(int(b))
        return algo(a.encode()).hexdigest() if algo else None
    if f == "is_ipv4":
        ps = a.split(".")
        return len(ps) == 4 and all(
            p.isdigit() and len(p) <= 3 and int(p) <= 255 for p in ps)
    if f == "is_ipv6":
        import ipaddress
        try:
            ipaddress.IPv6Address(a)
            return True
        except Exception:
            return False
    if f == "inet_aton":
        ps = a.split(".")
        if not 1 <= len(ps) <= 4 or not all(p.isdigit() for p in ps):
            return None
        ns = [int(p) for p in ps]
        if any(v > 255 for v in ns[:-1]):
            return None
        fill = 4 - len(ns)
        if ns[-1] >= 1 << (8 * (fill + 1)):
            return None
        acc = 0
        for v in ns[:-1]:
            acc = acc * 256 + v
        return acc * (256 ** (fill + 1)) + ns[-1]
    if f == "inet_ntoa":
        n = int(a)
        if not 0 <= n <= 4294967295:
            return None
        q = []
        for _ in range(4):
            q.append(str(n % 256))
            n //= 256
        return ".".join(reversed(q))
    if f == "inet6_aton":
        ps = a.split(".")
        if len(ps) == 4 and all(
                p.isdigit() and len(p) <= 3 and int(p) <= 255 for p in ps):
            return "".join("%02x" % int(p) for p in ps)
        import ipaddress
        try:
            return ipaddress.IPv6Address(a).packed.hex()
        except Exception:
            return None
    if f == "inet6_ntoa":
        import ipaddress
        try:
            raw = bytes.fromhex(a)
        except ValueError:
            return None
        if len(raw) == 16:
            return str(ipaddress.IPv6Address(raw))
        if len(raw) == 4:
            return str(ipaddress.IPv4Address(raw))
        return None
    if f == "space":
        return " " * int(a) if int(a) > 0 else ""
    if f == "char":
        bs = bytearray()
        for v in vals:
            u = int(v) % (1 << 32)
            chunk = []
            while True:
                chunk.append(u % 256)
                u //= 256
                if u == 0:
                    break
            bs.extend(reversed(chunk))
        return bytes(bs).decode("utf-8", errors="ignore")
    if f in ("bin", "oct") or (f == "hex" and isinstance(a, int)):
        u = a if a >= 0 else a + (1 << 64)
        return format(u, {"bin": "b", "oct": "o", "hex": "X"}[f])
    if f == "format":
        return f"{a:,.{max(int(b), 0)}f}"
    if f == "str_to_date":
        return _oracle_str_to_date(a, str(b))
    if f == "date_format":
        return _oracle_date_format(a, str(b))

    # strings
    if f in ("upper", "lower", "reverse", "trim", "ltrim", "rtrim"):
        return {"upper": str.upper, "lower": str.lower,
                "reverse": lambda s: s[::-1], "trim": str.strip,
                "ltrim": str.lstrip, "rtrim": str.rstrip}[f](a)
    if f == "length":
        return len(str(a).encode("utf-8"))  # MySQL LENGTH = bytes
    if f == "char_length":
        return len(a)
    if f == "ascii":
        return ord(a[0]) if a else 0
    if f == "concat":
        return "".join(str(v) for v in vals)
    if f == "substring":
        return _oracle_substring(a, int(vals[1]),
                                 int(vals[2]) if len(vals) > 2 else None)
    if f == "left":
        return a[: max(int(b), 0)]
    if f == "right":
        return a[-int(b):] if int(b) > 0 else ""
    if f == "replace":
        return a.replace(str(vals[1]), str(vals[2]))
    if f == "repeat":
        return a * max(int(b), 0)
    if f in ("lpad", "rpad"):
        n, p = int(vals[1]), str(vals[2])
        if n < 0:
            return None  # MySQL: negative target length -> NULL
        if len(a) >= n:
            return a[:n]
        if not p:
            return None  # padding needed but pad string empty -> NULL
        pad = (p * n)[: n - len(a)]
        return pad + a if f == "lpad" else a + pad
    if f in ("asin", "acos", "atan"):
        return getattr(math, f)(float(a))
    if f == "atan2":
        return math.atan2(float(a), float(b))
    if f == "cot":
        return 1.0 / math.tan(float(a))
    if f in ("sinh", "cosh", "tanh"):
        return getattr(math, f)(float(a))
    if f == "bit_length":
        return 8 * len(a.encode())
    if f == "crc32":
        import zlib

        return zlib.crc32(a.encode())
    if f == "md5":
        import hashlib

        return hashlib.md5(a.encode()).hexdigest()
    if f == "sha1":
        import hashlib

        return hashlib.sha1(a.encode()).hexdigest()
    if f == "hex":
        return a.encode().hex().upper()
    if f == "month_name":
        return ["January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"][a.month - 1]
    if f == "day_name":
        return ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
                "Friday", "Saturday"][a.isoweekday() % 7]
    if f == "instr":
        return a.find(str(b)) + 1
    if f in ("locate", "position"):
        return b.find(str(a)) + 1
    if f == "strcmp":
        return (a > str(b)) - (a < str(b))
    if f == "find_in_set":
        items = str(b).split(",")
        return items.index(a) + 1 if a in items else 0
    if f == "field":
        rest = [str(v) for v in vals[1:]]
        return rest.index(a) + 1 if a in rest else 0
    if f == "substring_index":
        delim, n = str(vals[1]), int(vals[2])
        if n > 0:
            return delim.join(a.split(delim)[:n])
        if n < 0:
            return delim.join(a.split(delim)[n:])
        return ""
    if f == "insert_str":
        pos, ln, new = int(vals[1]), int(vals[2]), str(vals[3])
        if pos < 1 or pos > len(a):
            return a
        return a[: pos - 1] + new + a[pos - 1 + max(ln, 0):]

    # regexp family — independent implementation (oracle discipline)
    if f in ("regexp", "rlike"):
        f = "regexp_like"
    if f.startswith("regexp"):
        return _oracle_regexp(f, a, [str(v) if isinstance(v, str) else v
                                     for v in vals[1:]])
    # JSON family
    if f.startswith("json"):
        return _oracle_json(f, a, vals[1:])
    if f == "to_base64":
        import base64 as _b64

        raw = _b64.b64encode(a.encode()).decode()
        chunks = [raw[i:i + 76] for i in range(0, len(raw), 76)]
        return "\n".join(chunks)
    if f == "from_base64":
        import base64 as _b64

        try:
            return _b64.b64decode(a.replace("\n", ""), validate=True).decode()
        except Exception:
            return None
    if f == "unhex":
        a = str(a)
        if not a or len(a) % 2 or not all(
                c in "0123456789abcdefABCDEF" for c in a):
            return None
        bs = bytes(int(a[i:i + 2], 16) for i in range(0, len(a), 2))
        try:
            return bs.decode("utf-8")
        except UnicodeDecodeError:
            return bs.decode("latin-1")
    if f == "quote":
        body = ""
        for ch in a:
            if ch == "\\":
                body += "\\\\"
            elif ch == "'":
                body += "\\'"
            elif ch == "\0":
                body += "\\0"
            elif ch == "\x1a":
                body += "\\Z"
            else:
                body += ch
        return "'%s'" % body
    if f == "soundex":
        table = str.maketrans("BFPVCGJKQSXZDTLMNR", "111122222222334556")
        letters = [c for c in a.upper() if c.isalpha()]
        if not letters:
            return ""
        res = letters[0]
        last = letters[0].translate(table)
        last = last if last.isdigit() else ""
        for c in letters[1:]:
            code = c.translate(table)
            code = code if code.isdigit() else ""
            if code and code != last:
                res += code
            if c not in ("H", "W"):
                last = code
        return res.ljust(4, "0")
    if f == "conv":
        fb, tb = int(vals[1]), int(vals[2])
        if not (2 <= fb <= 36 and 2 <= abs(tb) <= 36):
            return None
        t = a.strip()
        neg = t[:1] == "-"
        if t[:1] in "+-":
            t = t[1:]
        n, any_digit = 0, False
        for ch in t.lower():
            try:
                dv = int(ch, fb)
            except ValueError:
                break
            n = n * fb + dv
            any_digit = True
        if not any_digit:
            return "0"
        if neg:
            n = -n
        if tb > 0 and n < 0:
            n += 1 << 64
        pre = ""
        if tb < 0 and n < 0:
            pre, n = "-", -n
        base = abs(tb)
        if n == 0:
            return "0"
        digs = ""
        while n:
            digs = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"[n % base] + digs
            n //= base
        return pre + digs
    raise NotImplementedError(f"oracle function {f}")


def _oracle_add_months(d, n: int):
    import calendar

    total = d.year * 12 + (d.month - 1) + n
    y, m0 = divmod(total, 12)
    m = m0 + 1
    day = min(d.day, calendar.monthrange(y, m)[1])
    if isinstance(d, datetime.datetime):
        return d.replace(year=y, month=m, day=day)
    return datetime.date(y, m, day)


def _oracle_timestampdiff(unit: str, a, b):
    """Complete units from a to b — month family counted by stepping
    (independent of the engine's civil arithmetic)."""
    def as_dt(x):
        if isinstance(x, datetime.datetime):
            return x
        return datetime.datetime(x.year, x.month, x.day)

    A, B = as_dt(a), as_dt(b)
    if unit in ("MONTH", "QUARTER", "YEAR"):
        sign = 1 if B >= A else -1
        lo, hi = (A, B) if sign > 0 else (B, A)
        k = 0
        while as_dt(_oracle_add_months(lo, k + 1)) <= hi:
            k += 1
        per = {"MONTH": 1, "QUARTER": 3, "YEAR": 12}[unit]
        return sign * (k // per)
    us = {"MICROSECOND": 1, "SECOND": 10**6, "MINUTE": 60 * 10**6,
          "HOUR": 3600 * 10**6, "DAY": 86400 * 10**6,
          "WEEK": 7 * 86400 * 10**6}[unit]
    delta_us = round((B - A).total_seconds() * 10**6)
    q = abs(delta_us) // us  # truncation toward zero
    return q if delta_us >= 0 else -q


def _oracle_substring(s: str, pos: int, length=None) -> str:
    """MySQL SUBSTRING, written independently from the MySQL manual
    (not shared with expr/compile): position 1 is the first character,
    a negative position counts back from the last character, position 0
    (or a negative position before the start) yields ''; a non-positive
    length yields ''.
    """
    n = len(s)
    if pos > 0:
        begin = pos - 1
    elif pos < 0:
        begin = n + pos
        if begin < 0:
            return ""
    else:
        return ""
    if length is None:
        return s[begin:]
    if length <= 0:
        return ""
    return s[begin:begin + length]


def _oracle_str_to_date(s: str, fmt: str):
    spec_map = {"Y": "%Y", "y": "%y", "m": "%m", "d": "%d", "b": "%b",
                "M": "%B", "a": "%a", "W": "%A", "j": "%j", "e": "%d",
                "c": "%m", "H": "%H", "i": "%M", "s": "%S", "%": "%%"}
    py, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            py.append(spec_map.get(fmt[i + 1], fmt[i + 1]))
            i += 2
        else:
            py.append(fmt[i].replace("%", "%%"))
            i += 1
    try:
        t = datetime.datetime.strptime(s, "".join(py))
    except Exception:
        return None
    # time specifiers in the format -> DATETIME result (independent check)
    has_time = any(fmt[i] == "%" and i + 1 < len(fmt)
                   and fmt[i + 1] in "HhIiSsfTrp"
                   for i in range(len(fmt) - 1))
    return t if has_time else t.date()


def _oracle_date_format(d, fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] != "%" or i + 1 >= len(fmt):
            out.append(fmt[i])
            i += 1
            continue
        spec = fmt[i + 1]
        i += 2
        if spec == "Y":
            out.append("%04d" % d.year)
        elif spec == "y":
            out.append("%02d" % (d.year % 100))
        elif spec == "m":
            out.append("%02d" % d.month)
        elif spec == "c":
            out.append(str(d.month))
        elif spec == "d":
            out.append("%02d" % d.day)
        elif spec == "e":
            out.append(str(d.day))
        elif spec == "j":
            out.append("%03d" % d.timetuple().tm_yday)
        elif spec == "b":
            out.append(d.strftime("%b"))
        elif spec == "M":
            out.append(d.strftime("%B"))
        elif spec == "a":
            out.append(d.strftime("%a"))
        elif spec == "W":
            out.append(d.strftime("%A"))
        elif spec == "D":
            n = d.day
            sfx = "th" if 11 <= n % 100 <= 13 else \
                {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")
            out.append(f"{n}{sfx}")
        elif spec in ("H", "i", "s", "S"):
            out.append("00")
        elif spec == "f":
            out.append("000000")
        elif spec == "T":
            out.append("00:00:00")
        elif spec == "r":
            out.append("12:00:00 AM")
        elif spec == "p":
            out.append("AM")
        elif spec == "k":
            out.append("0")
        elif spec == "l":
            out.append("12")
        elif spec == "%":
            out.append("%")
        else:
            out.append(spec)
    return "".join(out)


def _oracle_regexp(f: str, s: str, rest: List[Any]):
    pat = str(rest[0])

    def rx(mt: str):
        fl = re.S if ("n" in mt or "s" in mt) else 0
        if "i" in mt and "c" not in mt:
            fl |= re.I
        if "m" in mt:
            fl |= re.M
        return re.compile(pat, fl)

    if f == "regexp_like":
        mt = str(rest[1]) if len(rest) > 1 else ""
        return rx(mt).search(s) is not None
    if f == "regexp_instr":
        pos = int(rest[1]) if len(rest) > 1 else 1
        occ = int(rest[2]) if len(rest) > 2 else 1
        ret = int(rest[3]) if len(rest) > 3 else 0
        mt = str(rest[4]) if len(rest) > 4 else ""
        k = 0
        for m in rx(mt).finditer(s, pos - 1):
            k += 1
            if k == occ:
                return m.end() + 1 if ret else m.start() + 1
        return 0
    if f == "regexp_substr":
        pos = int(rest[1]) if len(rest) > 1 else 1
        occ = int(rest[2]) if len(rest) > 2 else 1
        mt = str(rest[3]) if len(rest) > 3 else ""
        k = 0
        for m in rx(mt).finditer(s, pos - 1):
            k += 1
            if k == occ:
                return m.group(0)
        return None
    if f == "regexp_replace":
        repl = str(rest[1])
        pos = int(rest[2]) if len(rest) > 2 else 1
        occ = int(rest[3]) if len(rest) > 3 else 0
        mt = str(rest[4]) if len(rest) > 4 else ""
        head, tail = s[:pos - 1], s[pos - 1:]
        matches = list(rx(mt).finditer(tail))
        if occ == 0:
            keep = matches
        else:
            keep = matches[occ - 1:occ]
        out, last = [], 0
        for m in keep:
            out.append(tail[last:m.start()])
            out.append(repl)
            last = m.end()
        out.append(tail[last:])
        return head + "".join(out)
    raise NotImplementedError(f"oracle function {f}")


def _oracle_json(f: str, doc: str, rest: List[Any]):
    import json as _json

    def load(d):
        try:
            return True, _json.loads(d)
        except Exception:
            return False, None

    def walk(value, path: str):
        """Returns (found, node) for the $.a.b[0] path subset."""
        assert path[0] == "$"
        node = value
        i = 1
        while i < len(path):
            if path[i] == ".":
                i += 1
                if path[i] == '"':
                    end = path.index('"', i + 1)
                    key, i = path[i + 1:end], end + 1
                else:
                    j = i
                    while j < len(path) and (path[j].isalnum() or path[j] == "_"):
                        j += 1
                    key, i = path[i:j], j
                if not isinstance(node, dict) or key not in node:
                    return False, None
                node = node[key]
            elif path[i] == "[":
                end = path.index("]", i)
                idx, i = int(path[i + 1:end]), end + 1
                if isinstance(node, list):
                    if not (0 <= idx < len(node)):
                        return False, None
                    node = node[idx]
                elif idx != 0:
                    return False, None
            else:
                raise ValueError(path)
        return True, node

    if f == "json_valid":
        return load(doc)[0]
    ok, value = load(doc)
    if f == "json_unquote":
        if doc[:1] == '"' and doc[-1:] == '"' and ok and isinstance(value, str):
            return value
        return doc
    if f == "json_quote":
        # input is the plain string to quote, not a JSON document
        return _json.dumps(doc, ensure_ascii=False)
    if not ok:
        return None
    if f == "json_extract":
        found, node = walk(value, str(rest[0]))
        if not found:
            return None
        return _json.dumps(node, separators=(", ", ": "), ensure_ascii=False)
    if f == "json_type":
        if value is None:
            return "NULL"
        if isinstance(value, bool):
            return "BOOLEAN"
        return {dict: "OBJECT", list: "ARRAY", str: "STRING",
                int: "INTEGER", float: "DOUBLE"}[type(value)]
    if f == "json_length":
        found, node = walk(value, str(rest[0]) if rest else "$")
        if not found:
            return None
        return len(node) if isinstance(node, (dict, list)) else 1
    if f == "json_depth":
        def dep(x):
            if isinstance(x, dict):
                return 1 + max([dep(v) for v in x.values()] or [0])
            if isinstance(x, list):
                return 1 + max([dep(v) for v in x] or [0])
            return 1
        return dep(value)
    if f == "json_contains_path":
        mode = str(rest[0]).lower()
        hits = [walk(value, str(p))[0] for p in rest[1:]]
        return all(hits) if mode == "all" else any(hits)
    if f == "json_keys":
        found, node = walk(value, str(rest[0]) if rest else "$")
        if not found or not isinstance(node, dict):
            return None
        return _json.dumps(list(node.keys()), separators=(", ", ": "),
                           ensure_ascii=False)
    if f == "json_contains":
        found, node = walk(value, str(rest[1]) if len(rest) > 1 else "$")
        if not found:
            return None
        cok, cand = load(str(rest[0]))
        if not cok:
            return None

        def contains(t, c):
            if isinstance(t, list):
                if isinstance(c, list):
                    return all(any(contains(x, y) for x in t) for y in c)
                return any(contains(x, c) for x in t)
            if isinstance(t, dict) and isinstance(c, dict):
                return all(k in t and contains(t[k], v) for k, v in c.items())
            if isinstance(t, bool) or isinstance(c, bool):
                return t is c
            if isinstance(t, (int, float)) and isinstance(c, (int, float)):
                return float(t) == float(c)
            return type(t) is type(c) and t == c

        return contains(node, cand)
    raise NotImplementedError(f"oracle function {f}")


def _as_bool(v):
    if v is None:
        return None
    return bool(v)


def _numify(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, datetime.date):
        return v
    return v


def eval_expr_table(expr: Expr, table: PyTable) -> List[Any]:
    names = list(table.keys())
    n = len(table[names[0]]) if names else 0
    out = []
    for i in range(n):
        row = {k: table[k][i] for k in names}
        out.append(eval_expr_row(expr, row))
    return out


# ---------------------------------------------------------------------------
# oracle relational operators
# ---------------------------------------------------------------------------


def o_filter(table: PyTable, cond: Expr) -> PyTable:
    mask = eval_expr_table(cond, table)
    return {k: [v for v, m in zip(vs, mask) if m is True] for k, vs in table.items()}


def o_project(table: PyTable, exprs: Dict[str, Expr]) -> PyTable:
    return {name: eval_expr_table(e, table) for name, e in exprs.items()}


def o_aggregate(
    table: PyTable, keys: Sequence[str], aggs: Sequence[tuple]
) -> PyTable:
    """aggs: list of (func, arg_name, out_name[, filter_col])."""
    with decimal.localcontext(_CTX):
        return _o_aggregate_inner(table, keys, aggs)


def _o_aggregate_inner(
    table: PyTable, keys: Sequence[str], aggs: Sequence[tuple]
) -> PyTable:
    # runs under _CTX (prec 38) so Decimal sums of wide mantissas stay exact
    names = list(table.keys())
    n = len(table[names[0]]) if names else 0
    groups: Dict[tuple, List[int]] = {}
    for i in range(n):
        k = tuple(table[kn][i] for kn in keys)
        groups.setdefault(k, []).append(i)
    if not keys and not groups:
        groups[()] = []
    out: PyTable = {kn: [] for kn in keys}
    for a in aggs:
        out[a[2]] = []
    for k, idxs_all in groups.items():
        for kn, kv in zip(keys, k):
            out[kn].append(kv)
        for a in aggs:
            func, arg, on = a[0], a[1], a[2]
            fcol = a[3] if len(a) > 3 else None
            idxs = idxs_all if fcol is None else [
                i for i in idxs_all if table[fcol][i] is True
            ]
            vals = [table[arg][i] for i in idxs] if arg else None
            if func == "count":
                out[on].append(
                    len(idxs) if arg is None else sum(v is not None for v in vals)
                )
                continue
            if func in ("count_distinct", "approx_count_distinct"):
                # oracle is exact; approx parity tests assert tolerance
                out[on].append(len({v for v in vals if v is not None}))
                continue
            if func in ("var_pop", "var_samp", "stddev_pop", "stddev_samp"):
                xs = [float(v) for v in vals if v is not None]
                nmin = 2 if func.endswith("samp") else 1
                if len(xs) < nmin:
                    out[on].append(None)
                    continue
                mean = sum(xs) / len(xs)
                var = sum((x - mean) ** 2 for x in xs) / (
                    len(xs) - (1 if func.endswith("samp") else 0)
                )
                out[on].append(math.sqrt(var) if func.startswith("stddev") else var)
                continue
            nn = [v for v in vals if v is not None]
            if func in ("bit_and", "bit_or", "bit_xor"):
                # MySQL: u64 bit reduction; empty/all-NULL group yields the
                # identity, never NULL
                acc = (1 << 64) - 1 if func == "bit_and" else 0
                for v in nn:
                    u = int(v) % (1 << 64)
                    acc = (acc & u if func == "bit_and"
                           else acc | u if func == "bit_or" else acc ^ u)
                out[on].append(acc)
                continue
            if func == "group_concat":
                # a = (func, arg, name, filter, max_items, separator, distinct)
                max_items = int(a[4]) if len(a) > 4 and a[4] else 64
                sep = a[5] if len(a) > 5 else ","
                if len(a) > 6 and a[6]:
                    nn = sorted(set(nn))  # DISTINCT: value order
                out[on].append(sep.join(nn[:max_items]) if nn else None)
                continue
            if not nn:
                out[on].append(None)
                continue
            if func == "sum":
                out[on].append(sum(nn))
            elif func == "first":
                out[on].append(nn[0])
            elif func == "min":
                out[on].append(min(nn))
            elif func == "max":
                out[on].append(max(nn))
            elif func == "avg":
                s = sum(nn)
                if isinstance(s, float):
                    out[on].append(s / len(nn))
                else:
                    ds = D(s)
                    scale = -ds.as_tuple().exponent if ds.as_tuple().exponent < 0 else 0
                    out[on].append(
                        _CTX.divide(ds, D(len(nn))).quantize(
                            D(1).scaleb(-(scale + 4)), context=_CTX
                        )
                    )
            else:
                raise NotImplementedError(func)
    return out


def o_join(
    left: PyTable,
    right: PyTable,
    left_keys: Sequence[str],
    right_keys: Sequence[str],
    kind: str = "inner",
    suffix: str = "_r",
) -> PyTable:
    ln = list(left.keys())
    rn = list(right.keys())
    nl = len(left[ln[0]]) if ln else 0
    nr = len(right[rn[0]]) if rn else 0
    index: Dict[tuple, List[int]] = {}
    for j in range(nr):
        k = tuple(right[kn][j] for kn in right_keys)
        if any(v is None for v in k):
            continue
        index.setdefault(k, []).append(j)
    out_names = ln + [n if n not in ln else n + suffix for n in rn]
    out: PyTable = {n: [] for n in out_names}
    matched_r = set()
    for i in range(nl):
        k = tuple(left[kn][i] for kn in left_keys)
        matches = [] if any(v is None for v in k) else index.get(k, [])
        if kind in ("left_outer_semi", "left_outer_semi_null_aware"):
            for n in ln:
                out.setdefault(n, [])
            out.setdefault("__semi_matched", [])
            continue  # handled below, full scan after loop
        if kind == "semi":
            if matches:
                for n in ln:
                    out[n].append(left[n][i])
            continue
        if kind == "anti":
            if not matches:
                for n in ln:
                    out[n].append(left[n][i])
            continue
        if matches:
            for j in matches:
                matched_r.add(j)
                for n in ln:
                    out[n].append(left[n][i])
                for n, on in zip(rn, out_names[len(ln):]):
                    out[on].append(right[n][j])
        elif kind in ("left", "left_outer", "full", "full_outer"):
            for n in ln:
                out[n].append(left[n][i])
            for on in out_names[len(ln):]:
                out[on].append(None)
    if kind in ("left_outer_semi", "left_outer_semi_null_aware"):
        res = {n: list(left[n]) for n in ln}
        build_has_null = any(
            any(right[kn][j] is None for kn in right_keys) for j in range(nr)
        )
        flags = []
        for i in range(nl):
            k = tuple(left[kn][i] for kn in left_keys)
            has_null_key = any(v is None for v in k)
            m = (not has_null_key) and k in index
            if kind == "left_outer_semi":
                flags.append(m)
            else:
                if m:
                    flags.append(True)
                elif nr == 0:
                    flags.append(False)
                elif has_null_key or build_has_null:
                    flags.append(None)
                else:
                    flags.append(False)
        res["__semi_matched"] = flags
        return res
    if kind in ("semi", "anti"):
        return {n: out[n] for n in ln}
    if kind in ("right", "right_outer", "full", "full_outer"):
        for j in range(nr):
            if j not in matched_r:
                for n in ln:
                    out[n].append(None)
                for n, on in zip(rn, out_names[len(ln):]):
                    out[on].append(right[n][j])
    return out


def o_sort(table: PyTable, keys: Sequence[Tuple], limit: Optional[int] = None) -> PyTable:
    """keys: (name, desc) or (name, desc, nulls_first).  Default NULL
    placement is MySQL's: first ascending, last descending; an explicit
    nulls_first (non-None) overrides."""
    names = list(table.keys())
    n = len(table[names[0]]) if names else 0
    idx = list(range(n))

    def rowkey(i):
        parts = []
        for key in keys:
            name, desc = key[0], key[1]
            nf = key[2] if len(key) > 2 and key[2] is not None else not desc
            v = table[name][i]
            if v is None:
                parts.append((0 if nf else 1, 0))
            else:
                parts.append((1 if nf else 0, _Rev(v) if desc else v))
        return tuple(parts)

    idx.sort(key=rowkey)
    if limit is not None:
        idx = idx[:limit]
    return {nm: [table[nm][i] for i in idx] for nm in names}


def o_expand(table: PyTable, grouping_sets, gid_name="groupingID") -> PyTable:
    names = list(table.keys())
    n = len(table[names[0]]) if names else 0
    all_keys = {k for s in grouping_sets for k in s}
    out: PyTable = {nm: [] for nm in names}
    out[gid_name] = []
    for gi, s in enumerate(grouping_sets, start=1):
        for i in range(n):
            for nm in names:
                v = table[nm][i]
                if nm in all_keys and nm not in s:
                    v = None
                out[nm].append(v)
            out[gid_name].append(gi)
    return out


def o_cross_join(left: PyTable, right: PyTable, suffix="_r") -> PyTable:
    ln, rn = list(left.keys()), list(right.keys())
    nl = len(left[ln[0]]) if ln else 0
    nr = len(right[rn[0]]) if rn else 0
    out_names = ln + [n if n not in ln else n + suffix for n in rn]
    out: PyTable = {n: [] for n in out_names}
    for i in range(nl):
        for j in range(nr):
            for n in ln:
                out[n].append(left[n][i])
            for n, on in zip(rn, out_names[len(ln):]):
                out[on].append(right[n][j])
    return out


def o_anti_null_aware(left: PyTable, right: PyTable, left_keys, right_keys) -> PyTable:
    """NOT IN semantics."""
    ln = list(left.keys())
    rn = list(right.keys())
    nl = len(left[ln[0]]) if ln else 0
    nr = len(right[rn[0]]) if rn else 0
    build = [tuple(right[k][j] for k in right_keys) for j in range(nr)]
    build_has_null = any(any(v is None for v in b) for b in build)
    build_set = {b for b in build if all(v is not None for v in b)}
    out: PyTable = {n: [] for n in ln}
    for i in range(nl):
        k = tuple(left[kn][i] for kn in left_keys)
        if not build:
            keep = True
        elif any(v is None for v in k):
            keep = False
        elif k in build_set:
            keep = False
        elif build_has_null:
            keep = False
        else:
            keep = True
        if keep:
            for n in ln:
                out[n].append(left[n][i])
    return out


def o_window(table: PyTable, partition_by, order_by, funcs) -> PyTable:
    """order_by: [(name, desc)]; funcs: list of WindowDesc-like objects.
    Output sorted by (partition, order) like the engine."""
    names = list(table.keys())
    n = len(table[names[0]]) if names else 0
    idx = list(range(n))

    def pkey(i):
        return tuple(
            ((v is None), v if v is not None else 0) for v in
            (table[k][i] for k in partition_by)
        )

    def okey(i):
        parts = []
        for name, desc in order_by:
            v = table[name][i]
            if v is None:
                parts.append((0 if not desc else 1, 0))
            else:
                parts.append((1 if not desc else 0, _Rev(v) if desc else v))
        return tuple(parts)

    idx.sort(key=lambda i: (pkey(i), okey(i)))
    out = {nm: [table[nm][i] for i in idx] for nm in names}
    for f in funcs:
        col_out = []
        # group rows by partition
        i = 0
        while i < len(idx):
            j = i
            while j < len(idx) and pkey(idx[j]) == pkey(idx[i]):
                j += 1
            part = idx[i:j]
            m = len(part)
            if f.func == "row_number":
                col_out += list(range(1, m + 1))
            elif f.func in ("rank", "dense_rank"):
                ranks, r, d = [], 0, 0
                prev = None
                for t_, ii in enumerate(part):
                    k = okey(ii)
                    if k != prev:
                        r = t_ + 1
                        d += 1
                        prev = k
                    ranks.append(r if f.func == "rank" else d)
                col_out += ranks
            elif f.func == "percent_rank":
                prev = None
                r = 0
                ranks = []
                for t_, ii in enumerate(part):
                    k = okey(ii)
                    if k != prev:
                        r = t_
                        prev = k
                    ranks.append(r / max(m - 1, 1))
                col_out += ranks
            elif f.func == "cume_dist":
                keys_ = [okey(ii) for ii in part]
                col_out += [
                    sum(1 for k2 in keys_ if k2 <= keys_[t_]) / m
                    for t_ in range(m)
                ]
            elif f.func == "ntile":
                k = f.offset
                q, r = divmod(m, k)
                vals_ = []
                for t_ in range(m):
                    big = (q + 1) * r
                    if t_ < big:
                        vals_.append(t_ // (q + 1) + 1)
                    else:
                        vals_.append(r + (t_ - big) // max(q, 1) + 1)
                col_out += vals_
            elif f.func in ("lead", "lag"):
                for t_, ii in enumerate(part):
                    s = t_ - f.offset if f.func == "lag" else t_ + f.offset
                    if 0 <= s < m:
                        col_out.append(table[f.arg][part[s]])
                    else:
                        col_out.append(f.default)
            elif f.func == "first_value":
                col_out += [table[f.arg][part[0]]] * m
            elif f.func == "last_value":
                # default frame = RANGE ..CURRENT ROW: last PEER row
                t_ = 0
                while t_ < m:
                    u = t_
                    while u < m and okey(part[u]) == okey(part[t_]):
                        u += 1
                    col_out += [table[f.arg][part[u - 1]]] * (u - t_)
                    t_ = u
            elif f.func == "nth_value":
                nth = max(int(f.offset), 1)
                fr = getattr(f, "frame", None)
                for t_ in range(m):
                    if fr is not None:
                        prec, foll = fr
                        w0 = 0 if prec is None else max(0, t_ - prec)
                        w1 = m - 1 if foll is None else min(m - 1, t_ + foll)
                    else:
                        w0, w1 = 0, t_
                    tgt = w0 + nth - 1
                    col_out.append(table[f.arg][part[tgt]] if tgt <= w1 else None)
            elif f.func in ("sum", "count", "avg", "min", "max") and getattr(f, "frame", None) is not None:
                prec, foll = f.frame
                is_range = getattr(f, "frame_type", "rows") == "range"
                for t_, ii in enumerate(part):
                    if is_range:
                        oname, odesc = order_by[0]
                        vi = table[oname][ii]
                        frame_js = []
                        for jj in range(m):  # NB: must not shadow j
                            vj = table[oname][part[jj]]
                            if vi is None or vj is None:
                                if vi is None and vj is None:
                                    frame_js.append(jj)
                                continue
                            d_ = (vi - vj) if not odesc else (vj - vi)
                            if ((prec is None or d_ <= prec)
                                    and (foll is None or -d_ <= foll)):
                                frame_js.append(jj)
                    else:
                        w0 = 0 if prec is None else max(0, t_ - prec)
                        w1 = m - 1 if foll is None else min(m - 1, t_ + foll)
                        frame_js = list(range(w0, w1 + 1))
                    xs = ([table[f.arg][part[j]] for j in frame_js]
                          if f.arg else [1] * len(frame_js))
                    nn = [x for x in xs if x is not None]
                    if f.func == "count":
                        col_out.append(len(nn) if f.arg else len(frame_js))
                    elif not nn:
                        col_out.append(None)
                    elif f.func == "min":
                        col_out.append(min(nn))
                    elif f.func == "max":
                        col_out.append(max(nn))
                    elif f.func == "sum":
                        col_out.append(sum(nn))
                    else:  # avg
                        sm = sum(nn)
                        if isinstance(sm, float):
                            col_out.append(sm / len(nn))
                        else:
                            ds = D(sm)
                            sc = -ds.as_tuple().exponent if ds.as_tuple().exponent < 0 else 0
                            col_out.append(_CTX.divide(ds, D(len(nn))).quantize(
                                D(1).scaleb(-(sc + 4)), context=_CTX))
            elif f.func in ("sum", "min", "max", "count", "avg"):
                # SQL default frame with ORDER BY is RANGE UNBOUNDED
                # PRECEDING .. CURRENT ROW: the current row's PEERS are
                # included (and with no ORDER BY every row is a peer —
                # the whole partition)
                acc = None
                cnt = 0
                t_ = 0
                while t_ < m:
                    u = t_
                    while u < m and okey(part[u]) == okey(part[t_]):
                        u += 1
                    for ii in part[t_:u]:
                        v = table[f.arg][ii] if f.arg else 1
                        if f.arg is None or v is not None:
                            cnt += 1
                            if f.arg is not None:
                                if acc is None:
                                    acc = v
                                elif f.func in ("sum", "avg"):
                                    acc = acc + v
                                elif f.func == "min":
                                    acc = min(acc, v)
                                elif f.func == "max":
                                    acc = max(acc, v)
                    if f.func == "count":
                        val = cnt
                    elif f.func == "avg" and acc is not None:
                        sm = acc
                        if isinstance(sm, float):
                            val = sm / cnt
                        else:
                            ds = D(sm)
                            sc = (-ds.as_tuple().exponent
                                  if ds.as_tuple().exponent < 0 else 0)
                            val = _CTX.divide(ds, D(cnt)).quantize(
                                D(1).scaleb(-(sc + 4)), context=_CTX)
                    else:
                        val = acc
                    col_out += [val] * (u - t_)
                    t_ = u
            else:
                raise NotImplementedError(f.func)
            i = j
        out[f.name] = col_out
    return out


class _Rev:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return other.v == self.v


# ---------------------------------------------------------------------------
# random table generation (ColumnGenerator analog)
# ---------------------------------------------------------------------------


def random_pytable(
    rng: np.random.Generator,
    n: int,
    schema: Dict[str, DataType],
    *,
    null_prob: float = 0.1,
    int_range: Tuple[int, int] = (-100, 100),
    str_pool: Sequence[str] = ("aa", "bb", "cc", "dd", "ee", ""),
) -> PyTable:
    out: PyTable = {}
    for name, dt in schema.items():
        vals: List[Any] = []
        for _ in range(n):
            if dt.nullable and rng.random() < null_prob:
                vals.append(None)
                continue
            if dt.is_string:
                vals.append(str(rng.choice(list(str_pool))))
            elif dt.is_vector:
                vals.append(tuple(
                    float(np.round(x, 3))
                    for x in rng.normal(size=dt.precision)))
            elif dt.is_decimal:
                q = D(1).scaleb(-dt.scale)
                vals.append(D(int(rng.integers(*int_range))) * q)
            elif dt.is_float:
                vals.append(float(np.round(rng.normal() * 10, 3)))
            elif dt.kind is TypeKind.BOOL:
                vals.append(bool(rng.integers(0, 2)))
            elif dt.kind is TypeKind.DATE:
                vals.append(
                    datetime.date(1992, 1, 1) + datetime.timedelta(days=int(rng.integers(0, 2500)))
                )
            elif dt.kind is TypeKind.DATETIME:
                vals.append(
                    datetime.datetime(1992, 1, 1)
                    + datetime.timedelta(seconds=int(rng.integers(0, 2500 * 86400)))
                )
            else:
                vals.append(int(rng.integers(*int_range)))
        out[name] = vals
    return out


def pytable_to_block(table: PyTable, schema: Dict[str, DataType]) -> Block:
    """Host values -> engine Block (inverse of block_to_pytable)."""
    from ..core.block import column_from_numpy

    cols = {}
    for name, dt in schema.items():
        vals = table[name]
        validity = [v is not None for v in vals] if dt.nullable else None
        if dt.is_string or dt.is_vector:
            cols[name] = column_from_numpy(vals, dt, validity)
        else:
            from ..core.dtypes import (ZERO_DATE_DAYS, ZERO_DT_BASE_US,
                                       CivilDate, CivilDateTime, ZeroDate,
                                       ZeroDateTime)

            conv = []
            for v in vals:
                if v is None:
                    conv.append(0)
                elif isinstance(v, ZeroDate):
                    conv.append(ZERO_DATE_DAYS)
                elif isinstance(v, ZeroDateTime):
                    conv.append(ZERO_DT_BASE_US + v.tod_us)
                elif isinstance(v, CivilDateTime):
                    conv.append(v.epoch_days
                                if dt.kind is TypeKind.DATE else v.epoch_us)
                elif isinstance(v, CivilDate):
                    conv.append(v.epoch_days)
                elif dt.is_decimal:
                    conv.append(int(D(v).scaleb(dt.scale, context=_CTX)
                                    .to_integral_value()))
                elif dt.kind is TypeKind.DATETIME:
                    conv.append(round(
                        (v - datetime.datetime(1970, 1, 1)).total_seconds()
                        * 1_000_000))
                elif dt.kind is TypeKind.DATE:
                    conv.append((v - datetime.date(1970, 1, 1)).days)
                elif dt.kind is TypeKind.BOOL:
                    conv.append(bool(v))
                else:
                    conv.append(v)
            cols[name] = column_from_numpy(conv, dt, validity)
    return Block.from_dict(cols)


__all__ = [
    "PyTable",
    "block_to_pytable",
    "pytable_to_block",
    "sort_pytable",
    "assert_tables_equal",
    "eval_expr_table",
    "o_filter",
    "o_project",
    "o_aggregate",
    "o_join",
    "o_sort",
    "random_pytable",
]
