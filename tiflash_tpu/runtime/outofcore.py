"""Out-of-core aggregation: process a too-large table in chunks.

Role analog: the reference's spill-to-disk machinery
(``Core/Spiller.h:87``, agg spill + ``MergingBuckets`` restore).  The TPU
inversion: instead of spilling state OUT of memory mid-query, never let
the working set exceed HBM — slice the scanned table into fixed-size row
chunks, run the partial aggregation per chunk (one compiled program,
reused for every chunk), concatenate the partial states host-side, and
run the final merge.  Works for any plan of shape
``Aggregation(pipeline over a single base table)`` with splittable
aggregates (sum/count/avg/min/max/first).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..core.block import Block, Column
from ..exchange.skew import concat_blocks
from ..plan import nodes as P
from ..plan.compiler import compile_fragment


def _scan_tables(node: P.PlanNode) -> List[str]:
    if isinstance(node, P.TableScan):
        return [node.table]
    out: List[str] = []
    for c in node.children:
        out.extend(_scan_tables(c))
    return out


def chunkable(plan: P.PlanNode) -> bool:
    """True when the plan is a root Aggregation whose input pipeline reads
    exactly one table and every aggregate decomposes."""
    if not isinstance(plan, P.Aggregation):
        return False
    if any(a.func not in ("sum", "count", "avg", "min", "max", "first")
           for a in plan.aggs):
        return False
    return len(set(_scan_tables(plan.child))) == 1


def _slice_block(block: Block, start: int, rows: int) -> Block:
    cols = tuple(
        Column(
            jnp.asarray(c.data[start:start + rows]),
            None if c.validity is None else jnp.asarray(c.validity[start:start + rows]),
            c.dtype,
            c.dictionary,
            stats=c.stats,  # a row slice keeps the range invariant
        )
        for c in block.columns
    )
    sel = None if block.sel is None else jnp.asarray(block.sel[start:start + rows])
    return Block(names=block.names, columns=cols, sel=sel)


def run_chunked_aggregate(
    plan: P.Aggregation,
    tables: Dict[str, Block],
    chunk_rows: int,
) -> Block:
    """Execute ``plan`` without ever staging more than ``chunk_rows`` of
    the base table (plus partial states) on device."""
    from .distribute_helpers import build_partial_final  # lazy import (below)

    partial_plan, final_plan_builder = build_partial_final(plan)
    table_name = _scan_tables(plan.child)[0]
    base = tables[table_name]
    n = base.capacity
    # pad chunks to a uniform size so every chunk reuses one compilation
    fn = compile_fragment(partial_plan)
    from .cancel import checkpoint

    partials: List[Block] = []
    start = 0
    while start < n:
        checkpoint()  # cancellable between chunks
        rows = min(chunk_rows, n - start)
        chunk = _slice_block(base, start, rows)
        if rows < chunk_rows:
            pad = chunk_rows - rows
            filler = _slice_block(base, 0, pad).and_sel(
                jnp.zeros(pad, dtype=jnp.bool_)
            )
            chunk = concat_blocks(chunk, filler)
        sub = dict(tables)
        sub[table_name] = chunk
        out, overflows = fn(sub)
        for k, v in overflows.items():
            if int(v) > 0:
                raise RuntimeError(f"chunked aggregate overflow at {k}: {int(v)}")
        # pull the partial state to host so device memory stays bounded
        partials.append(
            Block(
                names=out.names,
                columns=tuple(
                    Column(
                        jnp.asarray(c.data),
                        None if c.validity is None else jnp.asarray(c.validity),
                        c.dtype, c.dictionary,
                    )
                    for c in out.columns
                ),
                sel=out.sel,
            ).compact()
        )
        start += rows

    merged = partials[0]
    for p in partials[1:]:
        merged = concat_blocks(merged, p)
    final_plan = final_plan_builder()
    ffn = compile_fragment(final_plan)
    out, overflows = ffn({"__partials": merged})
    for k, v in overflows.items():
        if int(v) > 0:
            raise RuntimeError(f"chunked final overflow at {k}")
    return out


__all__ = ["run_chunked_aggregate", "chunkable"]
