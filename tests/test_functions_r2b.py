"""Round-2 second breadth burst: NULL-safe equals, ILIKE + LIKE escape,
SPACE/CHAR, INET_NTOA/INET6_* — all vs the oracle.

Reference surface: tidbNullEQ / ilike3Args / like3Args / space /
IPv4NumToString / tiDBIPv6StringToNum / tiDBIPv6NumToString sigs mapped
at /root/reference/dbms/src/Flash/Coprocessor/DAGUtils.cpp:92.
"""

import numpy as np
import pytest

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.core.block import Block
from tiflash_tpu.core.dtypes import TypeKind
from tiflash_tpu.expr.nodes import call, col, lit
from tiflash_tpu.expr.compile import evaluate_expr
from tiflash_tpu.testing import oracle as O

SCHEMA = {
    "i": dt.INT64.with_nullable(True),
    "j": dt.INT64.with_nullable(True),
    "p": dt.INT32,
    "f": dt.FLOAT64.with_nullable(True),
    "s": dt.STRING.with_nullable(True),
    "s2": dt.STRING.with_nullable(True),
    "ip": dt.STRING,
}


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(41)
    table = O.random_pytable(
        rng, 250, SCHEMA, int_range=(-60, 60),
        str_pool=("Alpha", "beta", "al%pha", "A_B", "", "Éé", "x\\y"),
    )
    ips = ["1.2.3.4", "255.255.255.255", "10.0.0", "::1", "0.0.0.0",
           "2001:db8::ff00:42:8329", "nope", "01.2.3.4", "1.2",
           "fe80::", "::ffff:192.0.2.1"]
    n = len(table["i"])
    table["ip"] = [ips[int(rng.integers(0, len(ips)))] for _ in range(n)]
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


NULL_EQ_CASES = [
    call("null_eq", col("i"), col("j")),
    call("null_eq", col("i"), lit(7)),
    call("null_eq", col("f"), col("f")),
    call("null_eq", col("s"), col("s2")),
    call("null_eq", col("s"), lit("beta")),
]


@pytest.mark.parametrize("expr", NULL_EQ_CASES,
                         ids=[str(i) for i in range(len(NULL_EQ_CASES))])
def test_null_eq(expr, data):
    check(expr, data)


def test_null_eq_never_null(data):
    _, block = data
    c = evaluate_expr(call("null_eq", col("i"), col("j")), block)
    assert c.validity is None and not c.dtype.nullable


LIKE_CASES = [
    call("ilike", col("s"), lit("al%")),
    call("ilike", col("s"), lit("%A")),
    call("ilike", col("s"), lit("a_pha")),
    call("like", col("s"), lit("al|%pha"), lit("|")),
    call("like", col("s"), lit("A|_B"), lit("|")),
    call("ilike", col("s"), lit("a|_b"), lit("|")),
]


@pytest.mark.parametrize("expr", LIKE_CASES,
                         ids=[str(i) for i in range(len(LIKE_CASES))])
def test_ilike_and_escape(expr, data):
    check(expr, data)


def test_space_char(data):
    check(call("concat", call("space", col("p")), lit("!")), data)
    check(call("char", col("p")), data)
    check(call("char", col("p"), lit(77), lit(121)), data)


def test_inet_ntoa_roundtrip(data):
    # inet_aton gives u32-scale ints; inet_ntoa needs a proven range, so
    # drive it from a small int column mapped through plus
    check(call("inet_ntoa", col("p")), data)
    check(call("inet_ntoa", call("plus", col("p"), lit(16909060))), data)


def test_inet6(data):
    check(call("inet6_aton", col("ip")), data)
    check(call("inet6_ntoa", call("inet6_aton", col("ip"))), data)
