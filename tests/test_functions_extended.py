"""Extended scalar-function parity: math, rounding, date, string
(dictionary-LUT) functions vs the oracle."""

import numpy as np
import pytest

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.core.block import Block
from tiflash_tpu.expr.nodes import call, col, lit
from tiflash_tpu.expr.compile import evaluate_expr
from tiflash_tpu.testing import oracle as O

SCHEMA = {
    "i": dt.INT64.with_nullable(True),
    "p": dt.INT32,
    "f": dt.FLOAT64.with_nullable(True),
    "c": dt.Decimal(12, 2, nullable=True),
    "t": dt.DATE,
    "s": dt.STRING.with_nullable(True),
}


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    table = O.random_pytable(
        rng, 250, SCHEMA, int_range=(-40, 40),
        str_pool=("Alpha", "beta", " Gamma ", "DELTA x", "", "éé"),
    )
    return table, O.pytable_to_block(table, SCHEMA)


def check(expr, data, approx=False):
    table, block = data
    got_col = evaluate_expr(expr, block)
    got = O.block_to_pytable(Block(names=("r",), columns=(got_col,)))["r"]
    want = O.eval_expr_table(expr, table)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        if g is None or w is None:
            assert g is None and w is None, (i, g, w, expr)
        elif approx:
            assert abs(float(g) - float(w)) < 1e-9 * max(1, abs(float(w))), (i, g, w, expr)
        else:
            assert O._py_eq(g if not isinstance(w, bool) else bool(g), w), (i, g, w, expr)


MATH_CASES = [
    ("sqrt", [call("sqrt", call("abs", col("f")))], True),
    ("sqrt_neg_null", [call("sqrt", col("f"))], True),
    ("exp", [call("exp", col("c"))], True),
    ("ln", [call("ln", col("f"))], True),
    ("log2", [call("log2", call("abs", col("i")) + 1)], True),
    ("pow", [call("pow", col("c"), lit(2))], True),
    ("sin", [call("sin", col("f"))], True),
    ("sign", [call("sign", col("i"))], False),
    ("round_dec", [call("round", col("c"))], False),
    ("floor_dec", [call("floor", col("c"))], False),
    ("ceil_dec", [call("ceil", col("c"))], False),
    ("trunc_dec", [call("truncate", col("c"))], False),
    ("round_f", [call("round", col("f"))], False),
    ("floor_f", [call("floor", col("f"))], False),
    ("greatest", [call("greatest", col("i"), col("p"), lit(3))], False),
    ("least", [call("least", col("i"), col("p"))], False),
    ("nullif", [call("nullif", col("i"), col("p"))], False),
]


@pytest.mark.parametrize("name,exprs,approx", MATH_CASES, ids=[c[0] for c in MATH_CASES])
def test_math(name, exprs, approx, data):
    for e in exprs:
        check(e, data, approx=approx)


DATE_CASES = [
    call("date_add_days", col("t"), lit(40)),
    call("date_sub_days", col("t"), col("p")),
    call("datediff", col("t"), call("date_add_days", col("t"), col("p"))),
    call("day_of_week", col("t")),
    call("day_of_year", col("t")),
    call("quarter", col("t")),
    call("to_days", col("t")),
    call("week_of_year", col("t")),
    call("last_day", col("t")),
]


@pytest.mark.parametrize("expr", DATE_CASES, ids=[str(i) for i in range(len(DATE_CASES))])
def test_date_functions(expr, data):
    check(expr, data)


STRING_CASES = [
    call("upper", col("s")),
    call("lower", col("s")),
    call("reverse", col("s")),
    call("trim", col("s")),
    call("length", col("s")),
    call("char_length", col("s")),
    call("ascii", col("s")),
    call("concat", col("s"), lit("_suffix")),
    call("substring", col("s"), lit(2)),
    call("substring", col("s"), lit(2), lit(3)),
    call("substring", col("s"), lit(-3)),
    call("left", col("s"), lit(3)),
    call("right", col("s"), lit(2)),
    call("replace", col("s"), lit("a"), lit("_")),
    call("repeat", col("s"), lit(2)),
    call("lpad", col("s"), lit(6), lit("*")),
    call("rpad", col("s"), lit(6), lit("*")),
]


@pytest.mark.parametrize("expr", STRING_CASES, ids=[str(i) for i in range(len(STRING_CASES))])
def test_string_functions(expr, data):
    check(expr, data)


def test_string_transform_then_compare(data):
    # chained: upper(s) == 'ALPHA' must flow through re-encoded dictionary
    check(call("upper", col("s")) == "ALPHA", data)
    check(call("length", call("trim", col("s"))) > 3, data)


def test_cast_node(data):
    from tiflash_tpu.expr.nodes import cast

    table, block = data
    c = evaluate_expr(cast(col("i"), dt.Decimal(12, 3)), block)
    got = O.block_to_pytable(Block(names=("r",), columns=(c,)))["r"]
    for g, w in zip(got, table["i"]):
        if w is None:
            assert g is None
        else:
            assert g == O.D(w).quantize(O.D("0.001"))
    c2 = evaluate_expr(cast(col("c"), dt.INT64), block)
    got2 = O.block_to_pytable(Block(names=("r",), columns=(c2,)))["r"]
    import decimal
    for g, w in zip(got2, table["c"]):
        if w is None:
            assert g is None
        else:
            assert g == int(O.D(w).quantize(O.D(1), rounding=decimal.ROUND_HALF_UP))


BIT_CASES = [
    call("bit_and", col("i"), col("p")),
    call("bit_or", col("i"), col("p")),
    call("bit_xor", col("i"), col("p")),
    call("bit_not", col("p")),
    call("shift_left", call("abs", col("p")) % 7, lit(3)),
]


@pytest.mark.parametrize("expr", BIT_CASES, ids=[str(i) for i in range(len(BIT_CASES))])
def test_bit_ops(expr, data):
    table, block = data
    got_col = evaluate_expr(expr, block)
    got = O.block_to_pytable(Block(names=("r",), columns=(got_col,)))["r"]
    # direct python reference (oracle doesn't model bit ops separately)
    import operator
    def ref(i):
        row = {k: table[k][i] for k in table}
        def ev(e):
            from tiflash_tpu.expr.nodes import Call, ColumnRef, Literal
            if isinstance(e, ColumnRef):
                return row[e.name]
            if isinstance(e, Literal):
                return e.value
            vals = [ev(a) for a in e.args]
            if any(v is None for v in vals):
                return None
            f = e.func
            M = (1 << 64) - 1  # MySQL bit ops return BIGINT UNSIGNED
            if f == "bit_and": return (vals[0] & vals[1]) & M
            if f == "bit_or": return (vals[0] | vals[1]) & M
            if f == "bit_xor": return (vals[0] ^ vals[1]) & M
            if f == "bit_not": return ~vals[0] & M
            if f == "shift_left":
                return 0 if not (0 <= vals[1] < 64) else (vals[0] << vals[1]) & M
            if f == "abs": return abs(vals[0])
            if f == "modulo":
                import math as m
                return int(m.copysign(abs(vals[0]) % abs(vals[1]), vals[0])) if vals[0] else 0
            raise NotImplementedError(f)
        return ev(expr)
    for i, g in enumerate(got):
        assert g == ref(i), (i, g, ref(i))


def test_variance_aggregates():
    from tiflash_tpu.ops.aggregate import AggDesc, hash_aggregate

    rng = np.random.default_rng(21)
    schema = {"k": dt.INT8, "v": dt.Decimal(10, 2, nullable=True)}
    table = O.random_pytable(rng, 300, schema, int_range=(-50, 50))
    block = O.pytable_to_block(table, schema)
    aggs = [
        AggDesc("var_pop", "v", "vp"),
        AggDesc("var_samp", "v", "vs"),
        AggDesc("stddev_pop", "v", "sp"),
        AggDesc("stddev_samp", "v", "ss"),
    ]
    res = hash_aggregate(block, ["k"], aggs)
    got = O.block_to_pytable(res.block)
    want = O.o_aggregate(table, ["k"], [(a.func, a.arg, a.name) for a in aggs])
    O.assert_tables_equal(got, want, approx_cols=["vp", "vs", "sp", "ss"])


@pytest.mark.parametrize("expr,approx", [
    (call("asin", col("f") / lit(1000.0)), True),
    (call("acos", col("f") / lit(1000.0)), True),
    (call("atan", col("f")), True),
    (call("atan2", col("f"), col("i") + lit(100)), True),
    (call("cot", col("f") + lit(55.5)), True),
    (call("sinh", col("f") / lit(100.0)), True),
    (call("cosh", col("f") / lit(100.0)), True),
    (call("tanh", col("f")), True),
])
def test_more_math(expr, approx, data):
    check(expr, data, approx=approx)


@pytest.mark.parametrize("expr", [
    call("bit_length", col("s")),
    call("crc32", col("s")),
    call("md5", col("s")),
    call("sha1", col("s")),
    call("hex", col("s")),
    call("instr", col("s"), lit("a")),
    call("locate", lit("a"), col("s")),
    call("position", lit("e"), col("s")),
    call("strcmp", col("s"), lit("beta")),
    call("find_in_set", col("s"), lit("beta,Alpha,x")),
    call("field", col("s"), lit("beta"), lit("DELTA x"), lit("")),
    call("substring_index", col("s"), lit("a"), lit(1)),
    call("substring_index", col("s"), lit("a"), lit(-1)),
    call("insert_str", col("s"), lit(2), lit(1), lit("ZZ")),
    call("month_name", col("t")),
    call("day_name", col("t")),
])
def test_more_string_date_functions(expr, data):
    check(expr, data)
