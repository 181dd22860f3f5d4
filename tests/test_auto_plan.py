"""Auto-distribution planner tests: logical TPC-H plans distributed over
the 8-device mesh must match the single-node oracle exactly."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tiflash_tpu.bench.tpch_queries import q1_plan, q3_plan, q6_plan, sort_topn_plan
from tiflash_tpu.plan.auto import AutoPlanConfig, distribute_plan
from tiflash_tpu.runtime.executor import run_query
from tiflash_tpu.storage.tpch import generate_tpch
from tiflash_tpu.testing import oracle as O
from tiflash_tpu.testing.plan_oracle import execute_plan_oracle


@pytest.fixture(scope="module")
def env():
    mesh = Mesh(np.array(jax.devices()[:8]), ("d",))
    cat = generate_tpch(sf=0.002, seed=3)
    blocks = cat.blocks()
    stats = {n: t.row_count for n, t in cat.tables.items()}
    pytables = {n: O.block_to_pytable(b) for n, b in blocks.items()}
    return mesh, blocks, stats, pytables


@pytest.mark.parametrize("which", ["q1", "q6", "topn"])
def test_auto_distribute_simple(env, which):
    mesh, blocks, stats, pytables = env
    logical = {"q1": q1_plan, "q6": q6_plan, "topn": lambda: sort_topn_plan(20)}[which]()
    dist = distribute_plan(logical, stats, 8)
    out, summary = run_query(dist, blocks, mesh=mesh)
    got = O.block_to_pytable(out)
    want = execute_plan_oracle(logical, pytables)
    ordered = which in ("q1", "topn")
    O.assert_tables_equal(got, want, ordered=ordered)


@pytest.mark.parametrize("skew", [False, True])
def test_auto_distribute_q3(env, skew):
    mesh, blocks, stats, pytables = env
    logical = q3_plan()
    cfg = AutoPlanConfig(broadcast_threshold_rows=10**9 if not skew else 0,
                         skew_aware_joins=skew)
    dist = distribute_plan(logical, stats, 8, cfg)
    s = dist.pretty()
    if skew:
        assert "SkewShuffleJoin" in s
    else:
        assert "broadcast" in s
    out, _ = run_query(dist, blocks, mesh=mesh)
    got = O.block_to_pytable(out)
    want = execute_plan_oracle(logical, pytables)
    O.assert_tables_equal(got, want, ordered=True)
