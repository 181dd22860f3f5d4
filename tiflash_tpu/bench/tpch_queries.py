"""TPC-H-style query plans (the north-star configs of BASELINE.md).

These mirror the TPC-H plan shapes TiDB ships to TiFlash as tipb DAGs in
the reference's fullstack tests; built here directly as plan trees.
"""

from __future__ import annotations

from ..expr.nodes import col, lit
from ..ops.aggregate import AggDesc
from ..ops.sort import SortKey
from ..plan import nodes as P


def q1_plan() -> P.PlanNode:
    """Pricing summary report: scan+filter+8-agg group-by (config 1)."""
    scan = P.TableScan(
        "lineitem",
        columns=[
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    filt = P.Selection(col("l_shipdate") <= "1998-09-02", scan)
    proj = P.Projection(
        {
            "l_returnflag": col("l_returnflag"),
            "l_linestatus": col("l_linestatus"),
            "l_quantity": col("l_quantity"),
            "l_extendedprice": col("l_extendedprice"),
            "l_discount": col("l_discount"),
            "disc_price": col("l_extendedprice") * (lit(1.0) - col("l_discount")),
            "charge": col("l_extendedprice")
            * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")),
        },
        filt,
    )
    agg = P.Aggregation(
        keys=["l_returnflag", "l_linestatus"],
        aggs=[
            AggDesc("sum", "l_quantity", "sum_qty"),
            AggDesc("sum", "l_extendedprice", "sum_base_price"),
            AggDesc("sum", "disc_price", "sum_disc_price"),
            AggDesc("sum", "charge", "sum_charge"),
            AggDesc("avg", "l_quantity", "avg_qty"),
            AggDesc("avg", "l_extendedprice", "avg_price"),
            AggDesc("avg", "l_discount", "avg_disc"),
            AggDesc("count", None, "count_order"),
        ],
        child=proj,
    )
    return P.Sort([SortKey("l_returnflag"), SortKey("l_linestatus")], agg)


def q3_plan(agg_slots: int | None = None) -> P.PlanNode:
    """Shipping priority: 2 joins + group-by + topN (config 2)."""
    cust = P.Selection(
        col("c_mktsegment") == "BUILDING",
        P.TableScan("customer", columns=["c_custkey", "c_mktsegment"]),
    )
    orders = P.Selection(
        col("o_orderdate") < "1995-03-15",
        P.TableScan("orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_shippriority"]),
    )
    # orders ⋈ customer on custkey (customer unique) — semi shape but inner
    # works because custkey is unique in build
    j1 = P.Join(
        kind="inner",
        probe_keys=["o_custkey"],
        build_keys=["c_custkey"],
        probe=orders,
        build=cust,
        unique_build=True,
    )
    line = P.Selection(
        col("l_shipdate") > "1995-03-15",
        P.TableScan("lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]),
    )
    j2 = P.Join(
        kind="inner",
        probe_keys=["l_orderkey"],
        build_keys=["o_orderkey"],
        probe=line,
        build=j1,
        unique_build=True,
    )
    proj = P.Projection(
        {
            "l_orderkey": col("l_orderkey"),
            "o_orderdate": col("o_orderdate"),
            "o_shippriority": col("o_shippriority"),
            "revenue_part": col("l_extendedprice") * (lit(1.0) - col("l_discount")),
        },
        j2,
    )
    agg = P.Aggregation(
        keys=["l_orderkey", "o_orderdate", "o_shippriority"],
        aggs=[AggDesc("sum", "revenue_part", "revenue")],
        child=proj,
        num_slots=agg_slots,
    )
    return P.TopN(
        [SortKey("revenue", desc=True, nulls_first=False), SortKey("o_orderdate")],
        10,
        agg,
    )


def q6_plan() -> P.PlanNode:
    """Forecast revenue change: pure scan+filter+scalar agg."""
    scan = P.TableScan(
        "lineitem", columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    )
    filt = P.Selection(
        (col("l_shipdate") >= "1994-01-01")
        & (col("l_shipdate") < "1995-01-01")
        & (col("l_discount") >= 0.05)
        & (col("l_discount") <= 0.07)
        & (col("l_quantity") < 24.0),
        scan,
    )
    proj = P.Projection({"rev": col("l_extendedprice") * col("l_discount")}, filt)
    return P.Aggregation(keys=[], aggs=[AggDesc("sum", "rev", "revenue")], child=proj)


def sort_topn_plan(limit: int = 100) -> P.PlanNode:
    """Config 3: ORDER BY ... LIMIT over a big column."""
    scan = P.TableScan("lineitem", columns=["l_orderkey", "l_extendedprice"])
    return P.TopN(
        [SortKey("l_extendedprice", desc=True, nulls_first=False)], limit, scan
    )


__all__ = ["q1_plan", "q3_plan", "q6_plan", "sort_topn_plan"]
