"""Q1-at-SF10 stage breakdown (VERDICT r3 item 8): why is per-row cost
~2x SF1's?

Stages (one per process invocation — remote-compile quality degrades for
later programs in a shared process; min of 2-3 FRESH processes is the
honest number per CLAUDE.md):

  full    the whole q1 plan (Sort over the fused StreamAgg)
  agg     the Aggregation subtree alone (kernel + staging + recombination)
  narrow  q1 with l_tax zeroed: charge == disc_price bound, sum_charge
          stays int64 -> NO wide recombination, same rows/staging.
          full - narrow isolates the wide-output path cost.
  stage   input staging proxy: the int32 narrowing/astype of every
          column the kernel reads + sel reduction, checksummed — the
          pre-kernel HBM pass.

Usage:  python tools/measure_q1_sf10.py --stage full --sf 10
Emits one JSON line; run each stage 2-3x in fresh processes, keep min.
Reference bench discipline: Flash/tests/bench_aggregation_hash_map.cpp.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

import tiflash_tpu  # noqa: F401  (x64 on)
from tiflash_tpu.plan import nodes as P


def checksum(block):
    acc = jnp.int64(0)
    live = block.sel_mask()
    for c in block.columns:
        d = c.data
        if d.dtype == jnp.bool_:
            d = d.astype(jnp.int32)
        mask = live
        if c.validity is not None:
            v = c.validity
            mask = (mask[:, None] & v) if v.ndim == 2 else (mask & v)
        if d.ndim == 2 and mask.ndim == 1:
            mask = mask[:, None]
        if jnp.issubdtype(d.dtype, jnp.floating):
            acc = acc + jnp.sum(
                jnp.where(mask, d.astype(jnp.float64), 0.0)
                * (2.0 ** 20)).astype(jnp.int64)
            continue
        acc = acc + jnp.sum(jnp.where(mask, d.astype(jnp.int64), 0))
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["full", "agg", "narrow", "stage"])
    ap.add_argument("--sf", type=float, default=10.0)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args()
    log = lambda m: print(m, file=sys.stderr, flush=True)

    from tiflash_tpu.bench.tpch_queries import q1_plan
    from tiflash_tpu.plan.auto import autosize_plan
    from tiflash_tpu.plan.compiler import execute_plan
    from tiflash_tpu.storage.tpch import generate_tpch

    t0 = time.time()
    cat = generate_tpch(sf=args.sf, seed=7, tables=["lineitem"])
    blocks = cat.blocks()
    jax.block_until_ready(blocks)
    log(f"gen+stage {time.time()-t0:.1f}s rows={blocks['lineitem'].capacity}")

    plan = q1_plan()
    autosize_plan(plan, blocks)

    if args.stage == "narrow":
        # zero l_tax on the HOST copy: charge == disc_price per-row
        # bound, so sum_charge's recombined total provably fits int64
        # and wide_out stays empty (same staging, same row count)
        li = blocks["lineitem"]
        c = li["l_tax"]
        z = dataclasses.replace(
            c, data=jnp.zeros_like(c.data), stats=(0, 0),
            narrow32=None if c.narrow32 is None
            else jnp.zeros_like(c.narrow32))
        blocks = dict(blocks)
        blocks["lineitem"] = li.with_column("l_tax", z)

    sub = plan
    if args.stage == "agg":
        # the Aggregation subtree without the final Sort
        sub = plan.children[0]

    if args.stage == "stage":
        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"]

        def stage_fn(tables, carry):
            li = tables["lineitem"]
            acc = carry
            for nm in cols:
                c = li[nm]
                src = c.narrow32 if c.narrow32 is not None else c.data
                w = (src.astype(jnp.int32)
                     ^ (carry & jnp.int64(1)).astype(jnp.int32))
                acc = acc + jnp.sum(w.astype(jnp.int64))
            return acc

        step = jax.jit(stage_fn)
    else:
        def bench_step(tables, carry):
            li = tables["lineitem"]
            c = li["l_extendedprice"]
            bit = carry & jnp.int64(1)
            widened = None if c.stats is None else (c.stats[0] - 1,
                                                    c.stats[1] + 1)
            nc = dataclasses.replace(
                c, data=c.data ^ bit.astype(c.data.dtype), stats=widened,
                narrow32=None if c.narrow32 is None
                else c.narrow32 ^ bit.astype(jnp.int32))
            t2 = dict(tables)
            t2["lineitem"] = li.with_column("l_extendedprice", nc)
            out = execute_plan(sub, t2)
            return checksum(out) + carry * jnp.int64(0x9E3779B1)

        step = jax.jit(bench_step)

    seed = [0]

    def chain(K):
        seed[0] += 1
        carry = jnp.int64(seed[0] * 1000)
        t0 = time.time()
        for _ in range(K):
            carry = step(blocks, carry)
        _ = int(carry)
        return time.time() - t0

    t0 = time.time()
    chain(1)
    log(f"compile+first {time.time()-t0:.1f}s")
    from tiflash_tpu.ops.stream_fuse import FUSE_STATS

    t1 = min(chain(args.k1) for _ in range(2))
    t2 = min(chain(args.k2) for _ in range(2))
    t = max((t2 - t1) / (args.k2 - args.k1), 1e-9)
    n = blocks["lineitem"].capacity
    print(json.dumps({
        "stage": args.stage, "sf": args.sf, "rows": n,
        "ms_per_iter": round(t * 1e3, 3),
        "grows_per_s": round(n / t / 1e9, 2),
        "fuse": {k: int(v) for k, v in FUSE_STATS.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
