"""Stage breakdown for the Q3 config (BASELINE config 2) on the real chip.

Q3's rewritten tree is TopN(Proj(Join(StreamAgg(lineitem), Proj(j1)))):
each --stage carves a prefix subtree and carry-chains it alone, so
differencing stages attributes time per operator (the EXPLAIN ANALYZE
subtree-differencing model, applied to the bench config):

    j1     = orders x customer join alone
    agg    = the lineitem StreamAgg subtree alone
    join   = everything but TopN
    full   = the whole plan
    final-join cost = join - agg - j1;   topN cost = full - join

--slots overrides the Aggregation capacity (autosize currently picks
2^22; the round-2 126ms record was measured at the hand-tuned 2^21 —
the delta is pure capacity tax on the downstream join probe).

Host-dispatch carry chains (the fused fori_loop wrapper is known to
push Q3 past scoped-VMEM limits); at ~10-120ms/iter the relay's
~0.2-0.6ms dispatch cost is noise.  One stage per process invocation —
compile quality degrades for later programs in a shared process.
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


def carve(plan, stage: str):
    """Return (subplan, perturb_table, perturb_col) for a stage name."""
    aggs = []
    joins = []

    def walk(n):
        if isinstance(n, P.Aggregation):
            aggs.append(n)
        if isinstance(n, P.Join):
            joins.append(n)
        for c in n.children:
            walk(c)

    walk(plan)
    agg = aggs[0]
    # j1 = the join with no Aggregation beneath it
    def has_agg(n):
        return isinstance(n, P.Aggregation) or any(has_agg(c) for c in n.children)

    j1 = next(j for j in joins if not has_agg(j))
    if stage == "full":
        return plan, "lineitem", "l_extendedprice"
    if stage == "join":
        return plan.children[0], "lineitem", "l_extendedprice"
    if stage == "agg":
        return agg, "lineitem", "l_extendedprice"
    if stage == "j1":
        return j1, "orders", "o_shippriority"
    raise ValueError(stage)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["j1", "agg", "join", "full"])
    ap.add_argument("--slots", type=int, default=0,
                    help="override Aggregation.num_slots (0 = autosize)")
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args()
    log = lambda m: print(m, file=sys.stderr, flush=True)

    from tiflash_tpu.bench.tpch_queries import q3_plan
    from tiflash_tpu.plan.auto import autosize_plan
    from tiflash_tpu.plan.compiler import execute_plan
    from tiflash_tpu.storage.tpch import generate_tpch

    t0 = time.time()
    cat = generate_tpch(sf=1.0, seed=7,
                        tables=["lineitem", "orders", "customer"])
    blocks = cat.blocks()
    jax.block_until_ready(blocks)
    log(f"gen+stage {time.time()-t0:.1f}s")

    plan = q3_plan()
    autosize_plan(plan, blocks)
    if args.slots:
        def setslots(n):
            if isinstance(n, P.Aggregation):
                n.num_slots = args.slots
            for c in n.children:
                setslots(c)
        setslots(plan)
    sub, ptable, pcol = carve(plan, args.stage)

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
                fs = jnp.sum(jnp.where(mask, d.astype(jnp.float64), 0.0)
                             * (2.0 ** 20))
                acc = acc + fs.astype(jnp.int64)
                continue
            acc = acc + jnp.sum(jnp.where(mask, d.astype(jnp.int64), 0))
        return acc

    def bench_step(tables, carry):
        blk = tables[ptable]
        c = blk[pcol]
        bit = (carry & jnp.int64(1))
        widened = None if c.stats is None else (c.stats[0] - 1,
                                                c.stats[1] + 1)
        nc = dataclasses.replace(
            c, data=c.data ^ bit.astype(c.data.dtype), stats=widened,
            narrow32=None if c.narrow32 is None
            else c.narrow32 ^ bit.astype(jnp.int32))
        t2 = dict(tables)
        t2[ptable] = blk.with_column(pcol, nc)
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
    t1 = min(chain(args.k1) for _ in range(2))
    t2 = min(chain(args.k2) for _ in range(2))
    t = max((t2 - t1) / (args.k2 - args.k1), 1e-9)
    slots = args.slots or "auto"
    print(json.dumps({"stage": args.stage, "slots": slots,
                      "ms_per_iter": round(t * 1e3, 2),
                      "t_k1_ms": round(t1 * 1e3, 1),
                      "t_k2_ms": round(t2 * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
