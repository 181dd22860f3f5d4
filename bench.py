"""Benchmark driver — prints ONE JSON line for the round driver.

Headline config (BASELINE.md config 1): TPC-H Q1 at SF1 on one chip —
scan + filter + project + 8-aggregate group-by, fused into one XLA
program.  ``vs_baseline`` is achieved rows/s over the per-chip HBM
roofline rows/s for the columns the query touches (the reference repo
publishes no absolute numbers — BASELINE.md — so the roofline IS the
baseline; 1.0 means memory-bound speed of light, and the north-star
target "within 1.2x of roofline" is vs_baseline >= 0.83).

With no --config (the driver's invocation), ALL four configs run and the
one JSON line carries q1 as the headline plus an ``extra`` dict with the
q3/q6/topn numbers — VERDICT round-1 weak-item 5 (per-round visibility of
every config).

Timing methodology (required under the axon relay, where
block_until_ready returns before device completion and identical
dispatches can be elided): every iteration's input is perturbed by a
carry value computed from the previous iteration's result, so K
iterations form one serial dependency chain on device; we fetch only the
final carry, and difference two chain lengths to cancel the fixed
fetch/dispatch latency:  t_iter = (t(K2) - t(K1)) / (K2 - K1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# columns each config actually reads (for the roofline denominator)
COLS_READ = {
    "q1": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
           "l_returnflag", "l_linestatus", "l_shipdate"],
    "q3": ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    "q6": ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    "topn": ["l_orderkey", "l_extendedprice"],
}

HBM_BW = 819e9  # v5e peak HBM bandwidth


def bench_config(config: str, cat, args, vlog) -> dict:
    import jax
    import jax.numpy as jnp

    from tiflash_tpu.bench.tpch_queries import (
        q1_plan, q3_plan, q6_plan, sort_topn_plan,
    )
    from tiflash_tpu.plan.compiler import execute_plan

    plan = {"q1": q1_plan, "q3": lambda: q3_plan(agg_slots=2**21),
            "q6": q6_plan, "topn": lambda: sort_topn_plan(100)}[config]()
    blocks = cat.blocks()
    n_rows = cat["lineitem"].row_count
    bytes_per_row = sum(
        cat["lineitem"].block[c].data.dtype.itemsize for c in COLS_READ[config]
    )

    # carry-perturbed bench step: xor the carry's low bit into one int64
    # column so every iteration is a fresh, value-dependent execution.
    # Perturb a measure column, never a clustering key — flipping key bits
    # would void the block's clustered_by property and change the plan.
    perturb_col = {"q3": "l_extendedprice"}.get(config, COLS_READ[config][0])

    def checksum(block):
        """Folds EVERY output byte so no operator can be dead-code
        eliminated (num_rows alone is a compile-time constant for topN /
        scalar aggregates — a checksum that missed the value columns let
        XLA delete the whole computation and report fantasy numbers)."""
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
            if d.ndim == 2 and mask.ndim == 1:  # two-limb columns
                mask = mask[:, None]
            if jnp.issubdtype(d.dtype, jnp.floating):
                # 64-bit bitcasts are unimplemented in this TPU stack's
                # X64 rewrite pass; a scaled float fold keeps the value
                # dependency (sub-integer changes still move the carry)
                fs = jnp.sum(jnp.where(mask, d.astype(jnp.float64), 0.0)
                             * (2.0 ** 20))
                acc = acc + fs.astype(jnp.int64)
                continue
            acc = acc + jnp.sum(jnp.where(mask, d.astype(jnp.int64), 0))
        return acc

    def bench_step(tables, carry):
        li = tables["lineitem"]
        col = li[perturb_col]
        # xor of the low bit moves a value by at most 1: widen the range
        # stats instead of dropping them (the fused stream-agg kernel's
        # limb planning needs them), and keep the narrow32 storage shadow
        # in sync by perturbing it identically (it is part of the table)
        import dataclasses as _dc

        bit = (carry & jnp.int64(1))
        widened = None if col.stats is None else (col.stats[0] - 1,
                                                  col.stats[1] + 1)
        new_col = _dc.replace(
            col,
            data=col.data ^ bit.astype(col.data.dtype),
            stats=widened,
            narrow32=None if col.narrow32 is None
            else col.narrow32 ^ bit.astype(jnp.int32),
        )
        tables = dict(tables)
        tables["lineitem"] = li.with_column(perturb_col, new_col)
        out = execute_plan(plan, tables)
        return checksum(out) + carry * jnp.int64(0x9E3779B1)

    # every chain invocation gets a fresh carry seed so no dispatch in any
    # run is byte-identical to an earlier one — the relay elides repeated
    # identical dispatches, which made repeated chain(K) runs (identical
    # carry sequences!) report fantasy iteration times.
    # The K iterations run inside ONE dispatch (lax.fori_loop over the
    # carry): a host-level python loop measures max(device time, relay
    # dispatch rate), and the relay's per-dispatch cost (~0.2-0.6ms,
    # varies with tunnel load) dominated sub-ms configs — q1 once
    # "measured" 0.92ms/iter on a loaded tunnel vs its real 0.34ms.
    # Iterations stay serialized (each consumes the previous carry) and
    # the differenced chain lengths still cancel fetch latency.
    seed_ctr = [0]

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def fused_chain(tables, carry, K):
        return jax.lax.fori_loop(
            0, K, lambda i, c: bench_step(tables, c), carry)

    step_jit = jax.jit(bench_step)
    mode = ["fused"]

    def chain(K):
        seed_ctr[0] += 1
        carry = jnp.int64(seed_ctr[0])
        t0 = time.time()
        if mode[0] == "fused":
            _ = int(fused_chain(blocks, carry, K))  # full sync
        else:
            for _ in range(K):
                carry = step_jit(blocks, carry)
            _ = int(carry)
        return time.time() - t0

    k1, k2 = args.k1, args.k2
    t0 = time.time()
    try:
        chain(k1)  # compile (each static K compiles once)
        chain(k2)
    except Exception as e:  # the loop wrapper can change fusions past
        # VMEM limits (observed: q3 reduce-window scoped-vmem overflow)
        vlog(f"[{config}] fused chain failed ({type(e).__name__}); "
             "falling back to host-dispatch chain")
        mode[0] = "host"
        chain(1)
        chain(2)
    vlog(f"[{config}] compile+first {time.time()-t0:.1f}s ({mode[0]})")

    while True:
        t_k1 = min(chain(k1) for _ in range(2))
        t_k2 = min(chain(k2) for _ in range(2))
        # the chain-length difference must clear host/relay jitter
        # (~5-10ms): sub-ms iterations need longer chains or the slope
        # drowns (a q6 at ~0.15ms/iter once measured "0.000ms" at K=32)
        if (t_k2 - t_k1) >= 0.030 or k2 >= 512:
            break
        k1, k2 = k1 * 4, k2 * 4
        vlog(f"[{config}] slope below noise floor; rescaling to "
             f"K1={k1} K2={k2}")
    t_iter = max((t_k2 - t_k1) / (k2 - k1), 1e-9)
    rows_per_s = n_rows / t_iter
    vlog(f"[{config}] t(K1={k1})={t_k1*1e3:.1f}ms "
         f"t(K2={k2})={t_k2*1e3:.1f}ms -> {t_iter*1e3:.3f}ms/iter")

    roofline_rows_per_s = HBM_BW / bytes_per_row
    return {
        "metric": f"tpch_{config}_sf{args.sf:g}_rows_per_s",
        "value": round(rows_per_s / 1e6, 1),
        "unit": "Mrows/s",
        "vs_baseline": round(rows_per_s / roofline_rows_per_s, 3),
    }


def bench_topn_100m(args, vlog) -> dict:
    """BASELINE config 3 at its REAL size: ORDER BY ... LIMIT 100 over a
    100M-row synthetic int64 column (SF1 lineitem is only 6M rows)."""
    import jax
    import jax.numpy as jnp

    from tiflash_tpu.core.block import Block, Column
    from tiflash_tpu.core.dtypes import INT64
    from tiflash_tpu.ops.sort import SortKey
    from tiflash_tpu.plan import nodes as P
    from tiflash_tpu.plan.compiler import execute_plan

    N = 100_000_000
    k = (jax.random.bits(jax.random.PRNGKey(1), (N,), dtype=jnp.uint64)
         >> jnp.uint64(1)).astype(jnp.int64)
    blk = Block.from_dict({
        "k": Column(k, None, INT64),
        "v": Column(jnp.arange(N, dtype=jnp.int64), None, INT64,
                    stats=(0, N - 1)),
    })
    jax.block_until_ready(blk)
    plan = P.TopN([SortKey("k", desc=True, nulls_first=False)], 100,
                  P.TableScan("big", columns=["k", "v"]))

    def step(tables, carry):
        import dataclasses as _dc

        bit = (carry & jnp.int64(1))
        c = tables["big"]["k"]
        t2 = {"big": tables["big"].with_column(
            "k", _dc.replace(c, data=c.data ^ bit))}
        out = execute_plan(plan, t2)
        acc = jnp.int64(0)
        live = out.sel_mask()
        for col in out.columns:
            acc = acc + jnp.sum(jnp.where(live, col.data, 0))
        return acc + carry * jnp.int64(0x9E3779B1)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def fused_chain(tables, carry, K):
        return jax.lax.fori_loop(0, K, lambda i, c: step(tables, c), carry)

    def chain(K, seed):
        carry = jnp.int64(seed)
        t0 = time.time()
        _ = int(fused_chain({"big": blk}, carry, K))
        return time.time() - t0

    t0 = time.time()
    chain(4, 1)
    chain(12, 2)
    vlog(f"[topn100m] compile+first {time.time()-t0:.1f}s")
    t1 = min(chain(4, 10 + i) for i in range(2))
    t2 = min(chain(12, 20 + i) for i in range(2))
    t = max((t2 - t1) / 8, 1e-9)
    vlog(f"[topn100m] t(4)={t1*1e3:.1f}ms t(12)={t2*1e3:.1f}ms "
         f"-> {t*1e3:.3f}ms/iter")
    roofline = HBM_BW / 16  # two int64 columns scanned
    return {
        "metric": "topn_100m_rows_per_s",
        "value": round(N / t / 1e6, 1),
        "unit": "Mrows/s",
        "vs_baseline": round((N / t) / roofline, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--config", default="all",
                    choices=["all", "q1", "q3", "q6", "topn", "topn100m"])
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=32)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    import tiflash_tpu  # noqa: F401  (x64 on)
    from tiflash_tpu.storage.tpch import generate_tpch

    def vlog(msg):
        if args.verbose:
            print(msg, file=sys.stderr, flush=True)

    all_configs = ["q1", "q3", "q6", "topn", "topn100m"]
    configs = all_configs if args.config == "all" else [args.config]
    tpch_configs = [c for c in configs if c != "topn100m"]
    results = {}
    if tpch_configs:
        tables = ["lineitem"]
        if "q3" in tpch_configs:
            tables = ["lineitem", "orders", "customer"]
        t0 = time.time()
        cat = generate_tpch(sf=args.sf, seed=7, tables=tables)
        jax.block_until_ready(cat.blocks())
        vlog(f"gen+stage {time.time()-t0:.1f}s rows={cat['lineitem'].row_count}")
        for cfg in tpch_configs:
            try:
                results[cfg] = bench_config(cfg, cat, args, vlog)
            except Exception as e:  # one config must not sink the round record
                vlog(f"[{cfg}] FAILED: {e!r}")
                results[cfg] = {"metric": f"tpch_{cfg}_failed", "value": 0,
                                "unit": "Mrows/s", "vs_baseline": 0,
                                "error": str(e)[:200]}
        del cat  # free host+device copies before the 100M synthetic
    if "topn100m" in configs:
        try:
            results["topn100m"] = bench_topn_100m(args, vlog)
        except Exception as e:
            vlog(f"[topn100m] FAILED: {e!r}")
            results["topn100m"] = {"metric": "topn_100m_failed", "value": 0,
                                   "unit": "Mrows/s", "vs_baseline": 0,
                                   "error": str(e)[:200]}

    head = results[configs[0]]
    if len(configs) > 1:
        head = dict(head)
        head["extra"] = {c: results[c] for c in configs[1:]}
    print(json.dumps(head))


if __name__ == "__main__":
    main()
