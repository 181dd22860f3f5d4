"""Expression-layer parity tests vs the row-at-a-time oracle.

Role analog: ``dbms/src/Functions/tests`` (FunctionTest fixtures) and
``tests/fullstack-test/expr/`` — randomized columns, engine vs oracle.
"""

import numpy as np
import pytest

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.core.block import Block, column_from_numpy as cfn
from tiflash_tpu.expr.nodes import call, case_when, col, if_, lit
from tiflash_tpu.expr.compile import evaluate_expr
from tiflash_tpu.testing import oracle as O


SCHEMA = {
    "a": dt.INT64,
    "b": dt.INT32.with_nullable(True),
    "c": dt.Decimal(12, 2),
    "d": dt.Decimal(10, 2, nullable=True),
    "f": dt.FLOAT64.with_nullable(True),
    "s": dt.STRING.with_nullable(True),
    "t": dt.DATE,
    "bo": dt.BOOL.with_nullable(True),
}


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    table = O.random_pytable(rng, 300, SCHEMA)
    block = O.pytable_to_block(table, SCHEMA)
    return table, block


def check(expr, data, result_dtype_hint=None, approx=False):
    table, block = data
    got_col = evaluate_expr(expr, block)
    got = O.block_to_pytable(Block(names=("r",), columns=(got_col,)))["r"]
    want = O.eval_expr_table(expr, table)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        if approx and g is not None and w is not None:
            assert abs(float(g) - float(w)) < 1e-9, (i, g, w)
        else:
            assert O._py_eq(
                g if not isinstance(w, bool) else (None if g is None else bool(g)), w
            ), (i, g, w, expr)


ARITH_CASES = [
    col("a") + col("b"),
    col("a") - lit(7),
    col("a") * col("b"),
    col("c") + col("d"),
    col("c") - col("d"),
    col("c") * col("d"),
    call("negate", col("c")),
    call("abs", col("b")),
    col("a") % col("b"),
    call("int_div", col("a"), col("b")),
]


@pytest.mark.parametrize("expr", ARITH_CASES, ids=[str(e) for e in ARITH_CASES])
def test_arithmetic(expr, data):
    check(expr, data)


def test_decimal_divide(data):
    check(col("c") / col("d"), data)


def test_float_arith(data):
    check(col("f") * col("f") + col("f"), data, approx=True)
    check(col("f") / col("f"), data, approx=True)


CMP_CASES = [
    col("a") > col("b"),
    col("a") <= lit(5),
    col("c") >= col("d"),
    col("c") < 0.5,
    col("c") == 0.25,
    col("t") >= "1995-01-01",
    col("t") < "1994-06-07",
    col("s") == "bb",
    col("s") != "bb",
    col("s") < "bb",
    col("s") >= "b",
    col("s") <= "zz",
    col("s") > "",
]


@pytest.mark.parametrize("expr", CMP_CASES, ids=[str(i) for i in range(len(CMP_CASES))])
def test_comparisons(expr, data):
    check(expr, data)


LOGIC_CASES = [
    (col("a") > 0) & (col("b") > 0),
    (col("bo")) | (col("b") > 50),
    ~col("bo"),
    (col("bo") & (col("a") > 0)) | col("d").is_null(),
    call("is_not_null", col("d")),
]


@pytest.mark.parametrize("expr", LOGIC_CASES, ids=[str(i) for i in range(len(LOGIC_CASES))])
def test_logic_three_valued(expr, data):
    check(expr, data)


def test_conditionals(data):
    check(if_(col("a") > 0, col("a"), col("b")), data)
    check(call("coalesce", col("b"), col("a")), data)
    check(
        case_when((col("a") > 50, lit(1)), (col("a") > 0, lit(2)), default=lit(3)),
        data,
    )
    check(case_when((col("bo"), col("a")),), data)


def test_in_and_like(data):
    check(col("s").in_("aa", "cc"), data)
    check(col("a").in_(1, 2, 3), data)
    check(call("like", col("s"), lit("b%")), data)
    check(call("like", col("s"), lit("%b")), data)


def test_date_parts(data):
    check(call("year", col("t")), data)
    check(call("month", col("t")), data)
    check(call("day_of_month", col("t")), data)


def test_string_column_vs_column_cross_dictionary():
    """Comparing string columns from different tables (different
    dictionaries) must compare the STRINGS, not the raw codes."""
    a = cfn(["apple", "pear", "zebra", "kiwi"], dt.STRING)
    b_vals = ["pear", "apple", "aaa", "kiwi"]
    b = cfn(b_vals, dt.STRING)
    block = Block.from_dict({"a": a, "b": b})
    for op, pyop in [("equals", lambda x, y: x == y),
                     ("less", lambda x, y: x < y),
                     ("greater_or_equals", lambda x, y: x >= y)]:
        from tiflash_tpu.expr.nodes import call as _call

        got = evaluate_expr(_call(op, col("a"), col("b")), block).to_pylist()
        want = [pyop(x, y) for x, y in zip(["apple", "pear", "zebra", "kiwi"], b_vals)]
        assert got == want, (op, got, want)
