"""Capacity auto-sizing from stats (VERDICT r2 item 6): unset
num_slots / output_capacity derive from catalog rows x sampled
selectivity x sampled key NDV, with the overflow-retry loop as the
safety net.  Reference analog: adaptive hash-table sizing,
Interpreters/Aggregator.cpp:1230 (convertToTwoLevel)."""

import numpy as np

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.core.block import Block, column_from_numpy
from tiflash_tpu.expr.nodes import col, lit
from tiflash_tpu.ops.aggregate import AggDesc
from tiflash_tpu.plan import nodes as P
from tiflash_tpu.plan.auto import autosize_plan, _sample_ndv
from tiflash_tpu.testing import oracle as O


def test_ndv_extrapolation_clustered_and_uniform():
    n = 100_000
    # clustered: 4 rows per key -> ndv ~ 25k
    clus = column_from_numpy(np.arange(n) // 4, dt.INT64)
    est = _sample_ndv(clus, n, 4096)
    assert 20_000 <= est <= 40_000, est
    # tiny domain: saturates fast
    rng = np.random.default_rng(3)
    tiny = column_from_numpy(rng.integers(0, 7, n), dt.INT64)
    est2 = _sample_ndv(tiny, n, 4096)
    assert est2 <= 64, est2


def test_autosize_fills_agg_slots_and_join_capacity():
    rng = np.random.default_rng(5)
    n = 50_000
    blkL = Block.from_dict({
        "fk": column_from_numpy(np.sort(rng.integers(0, 2000, n)), dt.INT64),
        "v": column_from_numpy(rng.integers(0, 100, n), dt.INT64),
        "flt": column_from_numpy(rng.integers(0, 100, n), dt.INT64),
    })
    blkR = Block.from_dict({
        "pk": column_from_numpy(np.arange(2000), dt.INT64),
        "w": column_from_numpy(rng.integers(0, 9, 2000), dt.INT64),
    })
    plan = P.Aggregation(
        ["fk"], [AggDesc("sum", "v", "s")],
        P.Join(kind="inner", probe_keys=["fk"], build_keys=["pk"],
               probe=P.Selection(col("flt") < lit(10), P.TableScan("L")),
               build=P.TableScan("R")))
    autosize_plan(plan, {"L": blkL, "R": blkR})
    join = plan.child
    # ~10% selectivity * factor 2 -> far below the 50k default
    assert join.output_capacity is not None
    assert 4_096 <= join.output_capacity <= 32_768, join.output_capacity
    # agg keyed on fk: NDV ~2000 -> slots ~4096, not 50k
    assert plan.num_slots is not None
    assert 2_048 <= plan.num_slots <= 16_384, plan.num_slots

    # the sized plan still answers correctly through the runner (retry
    # net catches any undersizing)
    from tiflash_tpu.runtime.executor import run_query

    out, _ = run_query(plan, {"L": blkL, "R": blkR})
    got = O.sort_pytable(O.block_to_pytable(out.compact()))
    # oracle
    import collections

    fk = np.asarray(blkL["fk"].data); v = np.asarray(blkL["v"].data)
    flt = np.asarray(blkL["flt"].data)
    pk = set(np.asarray(blkR["pk"].data).tolist())
    want = collections.defaultdict(int)
    for f, val, fl in zip(fk, v, flt):
        if fl < 10 and int(f) in pk:
            want[int(f)] += int(val)
    want_sorted = sorted(want.items())
    assert got["fk"] == [k for k, _ in want_sorted]
    assert got["s"] == [s for _, s in want_sorted]


def test_autosize_respects_explicit_capacities():
    blk = Block.from_dict({
        "g": column_from_numpy(np.arange(100) % 5, dt.INT64),
        "v": column_from_numpy(np.arange(100), dt.INT64),
    })
    plan = P.Aggregation(["g"], [AggDesc("sum", "v", "s")],
                         P.TableScan("T"), num_slots=12345)
    autosize_plan(plan, {"T": blk})
    assert plan.num_slots == 12345  # hand-set values are preserved
