"""Resource control (token bucket) + TOML settings tests."""

import time

import numpy as np
import pytest

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.plan import nodes as P
from tiflash_tpu.runtime.executor import run_query
from tiflash_tpu.runtime.resource import RESOURCE_GROUPS, TokenBucket, to_ru
from tiflash_tpu.runtime.settings import Settings
from tiflash_tpu.testing import oracle as O


def test_token_bucket_refill_and_limit():
    b = TokenBucket(fill_rate=1000.0, capacity=100.0, tokens=100.0)
    assert b.try_consume(60)
    assert b.try_consume(40)
    assert not b.try_consume(50)  # empty now
    time.sleep(0.06)
    assert b.try_consume(50)  # refilled ~60


def test_resource_group_rejects_when_exhausted():
    RESOURCE_GROUPS.configure("tiny", fill_rate=0.001, capacity=0.001)
    t = {"k": list(range(200_000))}
    blocks = {"t": O.pytable_to_block(t, {"k": dt.INT64})}
    with pytest.raises(RuntimeError, match="resource group"):
        run_query(
            P.TableScan("t"), blocks,
            settings=Settings(resource_group="tiny"),
        )
    # unconfigured group admits freely
    out, _ = run_query(
        P.TableScan("t"), blocks, settings=Settings(resource_group="other")
    )
    assert out.capacity == 200_000


def test_to_ru_scales():
    assert to_ru(1_000_000, 0.0) == pytest.approx(10.0)
    assert to_ru(0, 0.1) == pytest.approx(10.0)


def test_settings_from_toml(tmp_path):
    p = tmp_path / "engine.toml"
    p.write_text(
        """
[engine]
default_shuffle_factor = 3.5
max_capacity_retries = 7
resource_group = "batch"
"""
    )
    s = Settings.from_toml(str(p))
    assert s.default_shuffle_factor == 3.5
    assert s.max_capacity_retries == 7
    assert s.resource_group == "batch"


def test_settings_env_override(monkeypatch):
    monkeypatch.setenv("TIFLASH_TPU_MAX_CAPACITY_RETRIES", "9")
    monkeypatch.setenv("TIFLASH_TPU_TOPN_FAST_PATH", "false")
    s = Settings.from_env()
    assert s.max_capacity_retries == 9
    assert s.topn_fast_path is False


def test_memory_limit_enforced():
    from tiflash_tpu.runtime.memory import MemoryLimitError

    t = {"k": list(range(10_000))}
    blocks = {"t": O.pytable_to_block(t, {"k": dt.INT64})}
    with pytest.raises(MemoryLimitError, match="exceed limit"):
        run_query(
            P.TableScan("t"), blocks,
            settings=Settings(max_bytes_per_device=1000),
        )
    out, _ = run_query(
        P.TableScan("t"), blocks,
        settings=Settings(max_bytes_per_device=10**9),
    )
    assert out.capacity == 10_000


def test_out_of_core_chunked_aggregation():
    """Memory-quota breach falls back to chunked partial/final execution
    with identical results (the spill analog)."""
    import tiflash_tpu.core.dtypes as dtt
    from tiflash_tpu.expr.nodes import col
    from tiflash_tpu.ops.aggregate import AggDesc

    rng = __import__("numpy").random.default_rng(5)
    n = 50_000
    t = {
        "k": [int(x) for x in rng.integers(0, 20, n)],
        "v": [int(x) for x in rng.integers(-100, 100, n)],
    }
    blocks = {"t": O.pytable_to_block(t, {"k": dtt.INT32, "v": dtt.INT64})}
    plan = P.Aggregation(
        ["k"],
        [AggDesc("sum", "v", "s"), AggDesc("count", None, "c"),
         AggDesc("avg", "v", "a"), AggDesc("min", "v", "mn")],
        P.Selection(col("v") > -90, P.TableScan("t")),
    )
    # generous run for the expected answer
    want_out, _ = run_query(plan, blocks)
    want = O.block_to_pytable(want_out)
    # tight quota forces chunking
    out, summary = run_query(
        plan, blocks, settings=Settings(max_bytes_per_device=300_000)
    )
    assert "chunked" in summary.plan_text
    got = O.block_to_pytable(out)
    O.assert_tables_equal(got, want)


def test_settings_agg_defaults_applied():
    """Session settings become per-aggregate knobs when the plan leaves
    them unset (group_concat_max_len analog)."""
    import numpy as np

    import tiflash_tpu.core.dtypes as dt
    from tiflash_tpu.ops.aggregate import AggDesc
    from tiflash_tpu.plan import nodes as P
    from tiflash_tpu.runtime.executor import QueryRunner
    from tiflash_tpu.runtime.settings import Settings
    from tiflash_tpu.testing import oracle as O

    schema = {"k": dt.INT32, "s": dt.STRING, "v": dt.INT64}
    rng = np.random.default_rng(3)
    table = O.random_pytable(rng, 60, schema, null_prob=0.0, int_range=(0, 3))
    block = O.pytable_to_block(table, schema)
    plan = P.Aggregation(
        ["k"],
        [AggDesc("group_concat", "s", "gc"),
         AggDesc("approx_count_distinct", "v", "acd")],
        P.TableScan("t"),
    )
    s = Settings(group_concat_max_items=2, approx_distinct_sketch_k=256)
    runner = QueryRunner(plan, settings=s)
    aggs = {a.name: a for n in [runner.plan] for a in _walk_aggs(runner.plan)}
    assert aggs["gc"].param == 2.0
    assert aggs["acd"].param == 256.0
    out, _ = runner.run({"t": block})
    got = O.block_to_pytable(out)
    # truncation to 2 items applied
    assert all(g is None or g.count(",") <= 1 for g in got["gc"])


def _walk_aggs(node):
    out = []
    if hasattr(node, "aggs"):
        out.extend(node.aggs)
    for c in getattr(node, "children", ()) or ():
        out.extend(_walk_aggs(c))
    return out


def test_settings_skew_knobs_flow_to_plan():
    from tiflash_tpu.plan.auto import AutoPlanConfig
    from tiflash_tpu.runtime.settings import Settings

    s = Settings(skew_hot_keys=7, skew_sample_per_device=99)
    cfg = AutoPlanConfig.from_settings(s)
    assert cfg.skew_hot_keys == 7 and cfg.skew_sample_per_device == 99
