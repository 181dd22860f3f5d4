"""Streaming VPU aggregation kernel (ops/pallas/stream_agg.py +
ops/stream_fuse.py) — interpret-mode parity vs the oracle.

Role analog: the reference's aggregation gtests
(``Interpreters/tests/gtest_aggregator.cpp``) for the direct methods;
here the fused scan->filter->project->agg path must match both the
unfused engine path and the independent python oracle, including NULL
propagation through arithmetic with constants.
"""

import numpy as np
import pytest

from tiflash_tpu.core.block import Block, column_from_numpy
from tiflash_tpu.core.dtypes import DATE, Decimal, INT64, STRING
from tiflash_tpu.expr.nodes import Call, ColumnRef, Literal
from tiflash_tpu.ops import stream_fuse as SF
from tiflash_tpu.ops.aggregate import AggDesc
from tiflash_tpu.plan import nodes as P
from tiflash_tpu.plan.compiler import compile_fragment
from tiflash_tpu.testing import oracle as O
from tiflash_tpu.testing.plan_oracle import execute_plan_oracle


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("TIFLASH_TPU_STREAM_KERNEL", "interpret")


def _run_parity(plan, tables, expect_fused=True):
    before = SF.FUSE_STATS["count"]
    out, overflows = compile_fragment(plan)(tables)
    for k, v in overflows.items():
        assert not bool(v), f"overflow at {k}"
    if expect_fused:
        assert SF.FUSE_STATS["count"] == before + 1, "kernel did not engage"
    got = O.block_to_pytable(out)
    pytables = {n: O.block_to_pytable(b) for n, b in tables.items()}
    want = execute_plan_oracle(plan, pytables)
    O.assert_tables_equal(got, want, ordered=False)
    return got


def _mktable(n=1000, nulls=False, seed=0):
    rng = np.random.default_rng(seed)
    grp = rng.choice(["aa", "bb", "cc", "dd"], size=n).tolist()
    qty = rng.integers(1, 51, size=n) * 100          # Decimal(15,2)
    price = rng.integers(90_000, 10_500_000, size=n)  # Decimal(15,2)
    disc = rng.integers(0, 11, size=n)                # Decimal(15,2) 0.00-0.10
    day = rng.integers(9000, 11000, size=n)           # DATE days
    flag = rng.choice(["X", "Y"], size=n).tolist()
    vd = rng.random(n) > 0.3 if nulls else None
    vq = rng.random(n) > 0.2 if nulls else None
    cols = {
        "grp": column_from_numpy(grp, STRING),
        "qty": column_from_numpy(qty, Decimal(15, 2, nullable=nulls),
                                 validity=vq),
        "price": column_from_numpy(price, Decimal(15, 2)),
        "disc": column_from_numpy(disc, Decimal(15, 2, nullable=nulls),
                                  validity=vd),
        "day": column_from_numpy(day, DATE),
        "flag": column_from_numpy(flag, STRING),
    }
    return {"t": Block.from_dict(cols)}


def _q1_like(keys=("grp",)):
    disc_price = Call("multiply", (
        ColumnRef("price"),
        Call("minus", (Literal(1), ColumnRef("disc"))),
    ))
    proj = P.Projection(
        exprs={
            "grp": ColumnRef("grp"),
            "qty": ColumnRef("qty"),
            "price": ColumnRef("price"),
            "disc": ColumnRef("disc"),
            "dp": disc_price,
        },
        child=P.Selection(
            cond=Call("less_or_equals", (ColumnRef("day"),
                                         Literal("1998-09-20"))),
            child=P.TableScan("t"),
        ),
    )
    return P.Aggregation(
        keys=list(keys),
        aggs=[
            AggDesc("sum", "qty", "sum_qty"),
            AggDesc("sum", "dp", "sum_dp"),
            AggDesc("avg", "price", "avg_price"),
            AggDesc("avg", "disc", "avg_disc"),
            AggDesc("count", "disc", "cnt_disc"),
            AggDesc("count", None, "cnt"),
        ],
        child=proj,
    )


def test_q1_like_parity():
    _run_parity(_q1_like(), _mktable())


def test_q1_like_with_nulls():
    """NULL args: sum/avg skip NULL rows; const parts of (1 - disc) must not
    leak into sums on NULL-disc rows; count(disc) counts non-null only."""
    _run_parity(_q1_like(), _mktable(nulls=True, seed=3))


def test_two_keys_and_in_filter():
    plan = P.Aggregation(
        keys=["grp", "flag"],
        aggs=[AggDesc("sum", "price", "s"), AggDesc("count", None, "c")],
        child=P.Selection(
            cond=Call("and", (
                Call("in", (ColumnRef("grp"), Literal("aa"), Literal("cc"),
                            Literal("zz"))),
                Call("greater", (ColumnRef("qty"), Literal(10))),
            )),
            child=P.TableScan("t"),
        ),
    )
    _run_parity(plan, _mktable(seed=5))


def test_string_compare_nonmember_literal():
    plan = P.Aggregation(
        keys=["flag"],
        aggs=[AggDesc("count", None, "c")],
        child=P.Selection(
            cond=Call("greater_or_equals", (ColumnRef("grp"), Literal("bz"))),
            child=P.TableScan("t"),
        ),
    )
    _run_parity(plan, _mktable(seed=6))


def test_static_out_of_range_literal():
    """Literal above every value in the column: statically decided filter."""
    plan = P.Aggregation(
        keys=["grp"],
        aggs=[AggDesc("sum", "qty", "s")],
        child=P.Selection(
            cond=Call("less", (ColumnRef("price"), Literal(10 ** 13))),
            child=P.TableScan("t"),
        ),
    )
    _run_parity(plan, _mktable(seed=7))


def test_empty_selection():
    plan = P.Aggregation(
        keys=["grp"],
        aggs=[AggDesc("sum", "qty", "s"), AggDesc("count", None, "c")],
        child=P.Selection(
            cond=Call("greater", (ColumnRef("qty"), Literal(10 ** 9))),
            child=P.TableScan("t"),
        ),
    )
    _run_parity(plan, _mktable(seed=8))


def test_no_keys_q6_like():
    revenue = Call("multiply", (ColumnRef("price"), ColumnRef("disc")))
    plan = P.Aggregation(
        keys=[],
        aggs=[AggDesc("sum", "rev", "revenue"), AggDesc("count", None, "c")],
        child=P.Projection(
            exprs={"rev": revenue},
            child=P.Selection(
                cond=Call("and", (
                    Call("greater_or_equals", (ColumnRef("disc"),
                                               Literal(0.02))),
                    Call("less", (ColumnRef("qty"), Literal(30))),
                )),
                child=P.TableScan("t"),
            ),
        ),
    )
    _run_parity(plan, _mktable(seed=9))


def test_fallback_on_large_domain(monkeypatch):
    """Key domain above MAX_SLOTS: falls back to the general path and still
    matches the oracle."""
    monkeypatch.setattr(SF, "MAX_SLOTS", 2)
    plan = P.Aggregation(
        keys=["grp"],
        aggs=[AggDesc("sum", "qty", "s")],
        child=P.TableScan("t"),
    )
    _run_parity(plan, _mktable(seed=10), expect_fused=False)


def test_fallback_missing_stats():
    """Columns without range stats are ineligible; general path matches."""
    tables = _mktable(seed=11)
    t = tables["t"]
    import dataclasses

    cols = tuple(
        dataclasses.replace(c, stats=None) for c in t.columns
    )
    tables = {"t": dataclasses.replace(t, columns=cols)}
    plan = P.Aggregation(
        keys=["grp"],
        aggs=[AggDesc("sum", "qty", "s")],
        child=P.TableScan("t"),
    )
    _run_parity(plan, tables, expect_fused=False)


def test_flush_chunking(monkeypatch):
    """Multi-chunk accumulation: periodic flush produces per-chunk partials
    that recombine exactly (grid of 5 tiles, flush every 2)."""
    from tiflash_tpu.ops.pallas import stream_agg as SA

    monkeypatch.setattr(SA, "FLUSH_TILES", 2)
    _run_parity(_q1_like(), _mktable(n=5 * 8192 - 7, seed=12))


def test_tpch_q1_q6_fused_parity():
    from tiflash_tpu.bench.tpch_queries import q1_plan, q6_plan
    from tiflash_tpu.storage.tpch import generate_tpch

    cat = generate_tpch(sf=0.002, seed=2)
    tables = cat.blocks()
    for plan in (q1_plan(), q6_plan()):
        _run_parity(plan, tables)


def test_fused_wide_recombination_past_int64():
    """Sums whose bound exceeds int64 recombine the SAME kernel plane sums
    into two-limb wide decimals (SF10+ scale: Q1's sum(charge) bound is
    rows * ~1.3e11 > 2^62).  Values near 2^45 at 2^17 rows trip the same
    guard at test size."""
    rng = np.random.default_rng(4)
    n = 1 << 18
    big = rng.integers(1 << 47, 1 << 48, size=n)  # mantissa ~2e14
    grp = rng.choice(["aa", "bb", "cc"], size=n).tolist()
    cols = {
        "grp": column_from_numpy(grp, STRING),
        "big": column_from_numpy(big, Decimal(17, 2)),
    }
    tables = {"t": Block.from_dict(cols)}
    plan = P.Aggregation(
        keys=["grp"],
        aggs=[AggDesc("sum", "big", "s"), AggDesc("avg", "big", "a"),
              AggDesc("count", None, "n")],
        child=P.TableScan("t"),
    )
    got = _run_parity(plan, tables, expect_fused=True)
    # sanity: at least one group's sum really exceeds int64
    assert any(abs(v) > (1 << 63) for v in
               [int(x.scaleb(2)) for x in got["s"]])
