"""TPC-H-style query plans (the north-star configs of BASELINE.md).

These mirror the TPC-H plan shapes TiDB ships to TiFlash as tipb DAGs in
the reference's fullstack tests; built here directly as plan trees.
"""

from __future__ import annotations

from ..expr.nodes import call, col, lit
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


def q3_plan(agg_slots: int | None = None, rewrite: bool = True) -> P.PlanNode:
    """Shipping priority: 2 joins + group-by + topN (config 2).

    With ``rewrite`` (default) the plan goes through
    ``plan.rewrite.eager_aggregation``: the revenue aggregation is pushed
    below the orders join, turning the 3-key post-join sort-agg over 6M
    joined rows into a sort-free single-key StreamAgg on the
    orderkey-clustered lineitem scan + a join over ~1.5M groups."""
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
    top = P.TopN(
        [SortKey("revenue", desc=True, nulls_first=False), SortKey("o_orderdate")],
        10,
        agg,
    )
    if rewrite:
        from ..plan.rewrite import eager_aggregation

        top = eager_aggregation(top)
    return top


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


def q4_plan() -> P.PlanNode:
    """Order priority checking: EXISTS semi-join + group-by count."""
    line = P.Selection(
        col("l_commitdate") < col("l_receiptdate"),
        P.TableScan("lineitem", columns=["l_orderkey", "l_commitdate", "l_receiptdate"]),
    )
    orders = P.Selection(
        (col("o_orderdate") >= "1993-07-01") & (col("o_orderdate") < "1993-10-01"),
        P.TableScan("orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]),
    )
    semi = P.Join(
        kind="semi", probe_keys=["o_orderkey"], build_keys=["l_orderkey"],
        probe=orders, build=line, output_capacity=1,  # semi: capacity unused
    )
    agg = P.Aggregation(
        keys=["o_orderpriority"], aggs=[AggDesc("count", None, "order_count")],
        child=semi,
    )
    return P.Sort([SortKey("o_orderpriority")], agg)


def q5_plan() -> P.PlanNode:
    """Local supplier volume: 4-way join chain + group-by (simplified: no
    supplier/nation identity condition beyond the chain)."""
    region = P.Selection(col("r_name") == "ASIA", P.TableScan("region"))
    nation = P.Join(
        kind="inner", probe_keys=["n_regionkey"], build_keys=["r_regionkey"],
        probe=P.TableScan("nation"), build=region, unique_build=True,
    )
    cust = P.Join(
        kind="inner", probe_keys=["c_nationkey"], build_keys=["n_nationkey"],
        probe=P.TableScan("customer", columns=["c_custkey", "c_nationkey"]),
        build=nation, unique_build=True,
    )
    orders = P.Selection(
        (col("o_orderdate") >= "1994-01-01") & (col("o_orderdate") < "1995-01-01"),
        P.TableScan("orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
    )
    oc = P.Join(
        kind="inner", probe_keys=["o_custkey"], build_keys=["c_custkey"],
        probe=orders, build=cust, unique_build=True,
    )
    li = P.Join(
        kind="inner", probe_keys=["l_orderkey"], build_keys=["o_orderkey"],
        probe=P.TableScan("lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]),
        build=oc, unique_build=True,
    )
    proj = P.Projection(
        {"n_name": col("n_name"),
         "rev": col("l_extendedprice") * (lit(1.0) - col("l_discount"))},
        li,
    )
    agg = P.Aggregation(["n_name"], [AggDesc("sum", "rev", "revenue")], proj)
    return P.Sort([SortKey("revenue", desc=True, nulls_first=False)], agg)


def q10_plan(agg_slots=None) -> P.PlanNode:
    """Returned item reporting: join + high-cardinality group-by + topN."""
    line = P.Selection(
        col("l_returnflag") == "R",
        P.TableScan("lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]),
    )
    orders = P.Selection(
        (col("o_orderdate") >= "1993-10-01") & (col("o_orderdate") < "1994-01-01"),
        P.TableScan("orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]),
    )
    j1 = P.Join(
        kind="inner", probe_keys=["l_orderkey"], build_keys=["o_orderkey"],
        probe=line, build=orders, unique_build=True,
    )
    j2 = P.Join(
        kind="inner", probe_keys=["o_custkey"], build_keys=["c_custkey"],
        probe=j1, build=P.TableScan("customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]),
        unique_build=True,
    )
    proj = P.Projection(
        {"c_custkey": col("o_custkey"), "c_acctbal": col("c_acctbal"),
         "rev": col("l_extendedprice") * (lit(1.0) - col("l_discount"))},
        j2,
    )
    agg = P.Aggregation(
        ["c_custkey", "c_acctbal"], [AggDesc("sum", "rev", "revenue")], proj,
        num_slots=agg_slots,
    )
    return P.TopN([SortKey("revenue", desc=True, nulls_first=False),
                   SortKey("c_custkey")], 20, agg)


def q12_plan() -> P.PlanNode:
    """Shipping modes: CASE-style conditional counts via -If filters."""
    line = P.Selection(
        (col("l_receiptdate") >= "1994-01-01") & (col("l_receiptdate") < "1995-01-01")
        & (col("l_commitdate") < col("l_receiptdate"))
        & (col("l_shipdate") < col("l_commitdate"))
        & col("l_shipmode").in_("MAIL", "SHIP"),
        P.TableScan("lineitem"),
    )
    oj = P.Join(
        kind="inner", probe_keys=["l_orderkey"], build_keys=["o_orderkey"],
        probe=line, build=P.TableScan("orders", columns=["o_orderkey", "o_orderpriority"]),
        unique_build=True,
    )
    proj = P.Projection(
        {"l_shipmode": col("l_shipmode"),
         "is_high": col("o_orderpriority").in_("1-URGENT", "2-HIGH"),
         "is_low": ~col("o_orderpriority").in_("1-URGENT", "2-HIGH")},
        oj,
    )
    agg = P.Aggregation(
        ["l_shipmode"],
        [AggDesc("count", None, "high_line_count", filter_col="is_high"),
         AggDesc("count", None, "low_line_count", filter_col="is_low")],
        proj,
    )
    return P.Sort([SortKey("l_shipmode")], agg)


def q14_plan() -> P.PlanNode:
    """Promotion effect: conditional-sum ratio over a join."""
    line = P.Selection(
        (col("l_shipdate") >= "1995-09-01") & (col("l_shipdate") < "1995-10-01"),
        P.TableScan("lineitem", columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]),
    )
    pj = P.Join(
        kind="inner", probe_keys=["l_partkey"], build_keys=["p_partkey"],
        probe=line, build=P.TableScan("part", columns=["p_partkey", "p_brand"]),
        unique_build=True,
    )
    proj = P.Projection(
        {"rev": col("l_extendedprice") * (lit(1.0) - col("l_discount")),
         "is_promo": call("like", col("p_brand"), lit("Brand#2%"))},
        pj,
    )
    agg = P.Aggregation(
        [],
        [AggDesc("sum", "rev", "promo_rev", filter_col="is_promo"),
         AggDesc("sum", "rev", "total_rev")],
        proj,
    )
    return P.Projection(
        {"promo_share": col("promo_rev") / col("total_rev")}, agg
    )


def q16_plan() -> P.PlanNode:
    """Supplier relationship: anti join + count_distinct group-by."""
    ps = P.Join(
        kind="inner", probe_keys=["ps_partkey"], build_keys=["p_partkey"],
        probe=P.TableScan("partsupp", columns=["ps_partkey", "ps_suppkey"]),
        build=P.Selection(col("p_size") <= 25, P.TableScan("part", columns=["p_partkey", "p_brand", "p_size"])),
        unique_build=True,
    )
    agg = P.Aggregation(
        ["p_brand"], [AggDesc("count_distinct", "ps_suppkey", "supplier_cnt")],
        ps,
    )
    return P.Sort([SortKey("supplier_cnt", desc=True, nulls_first=False),
                   SortKey("p_brand")], agg)


def q22_plan() -> P.PlanNode:
    """Global sales opportunity: anti join against orders + scalar stats."""
    cust = P.Selection(col("c_acctbal") > 0.0, P.TableScan("customer", columns=["c_custkey", "c_acctbal"]))
    anti = P.Join(
        kind="anti", probe_keys=["c_custkey"], build_keys=["o_custkey"],
        probe=cust, build=P.TableScan("orders", columns=["o_custkey"]),
        output_capacity=1,
    )
    return P.Aggregation(
        [], [AggDesc("count", None, "numcust"), AggDesc("sum", "c_acctbal", "totacctbal"),
             AggDesc("avg", "c_acctbal", "avgbal")],
        anti,
    )


def sort_topn_plan(limit: int = 100) -> P.PlanNode:
    """Config 3: ORDER BY ... LIMIT over a big column."""
    scan = P.TableScan("lineitem", columns=["l_orderkey", "l_extendedprice"])
    return P.TopN(
        [SortKey("l_extendedprice", desc=True, nulls_first=False)], limit, scan
    )


__all__ = ["q1_plan", "q3_plan", "q4_plan", "q5_plan", "q6_plan", "q10_plan",
           "q12_plan", "q14_plan", "q16_plan", "q22_plan", "sort_topn_plan"]
