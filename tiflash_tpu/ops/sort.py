"""Sort and Top-N.

Role analog: ``Interpreters/sortBlock.cpp:402`` (in-block pdqsort via
``IColumn::getPermutation`` + permute) and the partial-sort / k-way-merge
stream pair (``DataStreams/PartialSortingBlockInputStream.h``,
``MergeSortingBlockInputStream.h:32``).

TPU re-design: one ``lax.sort`` over the whole device-resident batch
replaces the per-block sort + merge cascade (there is no block-at-a-time
streaming on device — the batch IS the table shard).  Top-N uses
``lax.top_k`` on a single packed key when possible, else full sort + slice.

Descending order / NULLS FIRST are handled by key transforms (bit-flips),
not comparator flags: ``lax.sort`` is ascending-lexicographic only.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.block import Block, Column
from ..core.dtypes import INT64


@dataclasses.dataclass(frozen=True)
class SortKey:
    """Reference: ``Core/SortDescription.h`` (column, direction, nulls)."""

    name: str
    desc: bool = False
    # MySQL/TiDB: NULL is smallest — first ascending, LAST descending.
    # None = follow that default; explicit True/False overrides.
    nulls_first: Optional[bool] = None

    @property
    def nulls_first_resolved(self) -> bool:
        return (not self.desc) if self.nulls_first is None else self.nulls_first


def _sort_operand(col: Column, desc: bool, nulls_first: bool) -> List[jnp.ndarray]:
    """Turn one column into ascending-sortable operand arrays.

    Descending numeric: negate where safe; generally flip via bitwise trick
    on the raw key.  We keep it simple: emit (null_rank, value') where
    value' is transformed so ascending lax.sort yields the wanted order."""
    data = col.data
    if col.dtype.is_wide_decimal and data.ndim == 2:
        # multi-limb mantissa (core/wide.py): value order == lexicographic
        # limb order because lower limbs are non-negative — recurse per limb
        ops: List[jnp.ndarray] = []
        if col.validity is not None:
            rank = jnp.where(col.validity, 1 if nulls_first else 0,
                             0 if nulls_first else 1)
            ops.append(rank.astype(jnp.int8))
        for i in range(data.shape[-1]):
            ops.extend(_sort_operand(Column(data[:, i], None, INT64), desc,
                                     nulls_first))
        return ops
    if data.dtype == jnp.bool_:
        data = data.astype(jnp.int8)
    if desc:
        if jnp.issubdtype(data.dtype, jnp.floating):
            data = -data
        elif jnp.issubdtype(data.dtype, jnp.unsignedinteger):
            data = ~data
        else:
            # avoid INT_MIN negation overflow: flip bits instead of negate
            data = ~data
    ops: List[jnp.ndarray] = []
    if col.validity is not None:
        # ascending lax.sort puts rank 0 first
        if nulls_first:
            rank = jnp.where(col.validity, 1, 0)
        else:
            rank = jnp.where(col.validity, 0, 1)
        ops.append(rank.astype(jnp.int8))
    ops.append(data)
    return ops


def sort_block(block: Block, sort_keys: Sequence[SortKey]) -> Block:
    """Full sort of live rows (dead rows pushed to the end).

    Output is a compacted block: rows [0, count) are the live rows in
    order, sel marks them."""
    n = block.capacity
    live = block.sel_mask()
    operands: List[jnp.ndarray] = [~live]  # live rows first
    for sk in sort_keys:
        operands.extend(_sort_operand(block[sk.name], sk.desc, sk.nulls_first_resolved))
    nk = len(operands)
    operands.append(jnp.arange(n, dtype=jnp.int32))
    out = jax.lax.sort(tuple(operands), num_keys=nk, is_stable=True)
    perm = out[-1]
    sorted_block = block.take(perm)
    count = jnp.sum(live, dtype=jnp.int32)
    sel = jnp.arange(n, dtype=jnp.int32) < count
    return sorted_block.with_sel(sel)


def _single_key_rank(block: Block, sort_keys: Sequence[SortKey]):
    """int64 rank where bigger = earlier in ORDER BY order, or None when
    the order doesn't rank-pack.  Two safe cases:

    - 64-bit integer-kind key with NO validity and NO selection mask:
      rank = x (desc) / ~x (asc) — a bijection, no sentinels needed.
    - <=32-bit integer-kind key: value shifted left 2 bits, with dead
      rows at int64 min and NULL rows at a sentinel per NULL placement —
      the shift guarantees sentinel slots can't collide with values.
    """
    if len(sort_keys) != 1:
        return None
    sk = sort_keys[0]
    col = block[sk.name]
    t = col.dtype
    int_kind = t.is_integer or t.kind.value in ("date", "datetime",
                                                "duration", "bool") \
        or (t.is_decimal and col.data.ndim == 1)
    if not int_kind or t.kind.value in ("u64",):
        return None
    x = col.data
    if col.validity is None and block.sel is None:
        r = x.astype(jnp.int64)
        return r if sk.desc else jnp.bitwise_not(r)
    if x.dtype.itemsize > 4:
        return None
    val = x.astype(jnp.int64)
    val = val if sk.desc else -val
    rank = (val << 2) | 2
    imin = jnp.iinfo(jnp.int64).min
    if col.validity is not None:
        null_rank = (jnp.iinfo(jnp.int64).max
                     if sk.nulls_first_resolved else imin + 1)
        rank = jnp.where(col.validity, rank, null_rank)
    if block.sel is not None:
        rank = jnp.where(block.sel, rank, imin)
    return rank


def _topk_tiled(block: Block, rank: jnp.ndarray, limit: int,
                tile: int) -> Block:
    """Cascaded per-tile ``lax.top_k`` selection over an int64 rank
    (bigger = earlier), finishing with one tiny stable sort.  Ties
    resolve by original position at every level (top_k prefers lower
    indices; the final sort uses position as the second key), so the
    result order matches the stable full-sort path exactly."""
    imin = jnp.iinfo(jnp.int64).min
    n = rank.shape[0]
    pos = None  # level-0 positions are implicit (tile offset + index)
    while rank.shape[0] > 4 * tile:
        m = rank.shape[0]
        T = -(-m // tile)
        pad = T * tile - m
        r2 = jnp.concatenate([rank, jnp.full((pad,), imin, jnp.int64)]) \
            if pad else rank
        v, i = jax.lax.top_k(r2.reshape(T, tile), limit)
        idx = (i + (jnp.arange(T, dtype=jnp.int32) * tile)[:, None]
               ).reshape(-1)
        if pos is None:
            # level-0 positions: padded slots land at >= n, losing every
            # position tie (they also carry rank == imin)
            pos = idx
        else:
            pos_pad = jnp.concatenate(
                [pos, jnp.full((pad,), jnp.iinfo(jnp.int32).max,
                               jnp.int32)]) if pad else pos
            pos = jnp.take(pos_pad, idx)
        rank = v.reshape(-1)
    if pos is None:
        pos = jnp.arange(n, dtype=jnp.int32)
    _, p_sorted = jax.lax.sort(
        (jnp.bitwise_not(rank), pos), num_keys=2)
    perm = p_sorted[:limit]
    out = block.take(perm)
    live = block.sel_mask()
    count = jnp.sum(live, dtype=jnp.int32)
    kept = jnp.arange(limit, dtype=jnp.int32) < count
    return out.with_sel(kept)


def top_n(block: Block, sort_keys: Sequence[SortKey], limit: int) -> Block:
    """ORDER BY ... LIMIT k.

    Single ascending int key fast path: pack into one uint64 rank and use
    ``lax.top_k`` on the negated rank (top_k is max-k); general path sorts
    fully then slices.  Output capacity is exactly ``limit`` (padded if
    fewer live rows)."""
    n = block.capacity
    limit = min(limit, n)
    live = block.sel_mask()

    # tiled selection for large inputs: any global top-k row is inside its
    # tile's top-k, so sort (T, W) tiles along the short axis — a
    # log²(W) bitonic network instead of log²(n) — keep k candidates per
    # tile, then fully sort the T*k survivors.  Stability: candidates stay
    # in tile order and both sorts are stable, so ties keep original
    # row order exactly like the flat path.
    TILE = 2048
    if n >= 4 * TILE and limit <= 128:
        # per-tile lax.top_k fast path: measured (v5e, 100M rows) a
        # (T, 2048) top_k(100) costs the same as a 1-operand tile sort
        # (51.7ms) and returns indices free, where the sort path pays
        # per extra operand (2-op 61ms; the old flag+key+iota 3-op
        # variant measured 104ms end-to-end).  Single-key orders that
        # rank-pack into int64 qualify.
        rank = _single_key_rank(block, sort_keys)
        if rank is not None:
            return _topk_tiled(block, rank, limit, TILE)
    if n >= 4 * TILE and limit <= TILE:
        live = block.sel_mask()
        operands: List[jnp.ndarray] = [~live]
        for sk in sort_keys:
            operands.extend(
                _sort_operand(block[sk.name], sk.desc, sk.nulls_first_resolved)
            )
        nk = len(operands)
        operands.append(jnp.arange(n, dtype=jnp.int32))
        T = -(-n // TILE)
        pad = T * TILE - n

        def worst_of(arr):
            if arr.dtype == jnp.bool_:
                return True
            if jnp.issubdtype(arr.dtype, jnp.floating):
                return jnp.inf
            return jnp.iinfo(arr.dtype).max

        tiled = []
        for i, arr in enumerate(operands):
            fill = 0 if i == nk else worst_of(arr)  # payload pad is inert
            if pad:
                arr = jnp.concatenate(
                    [arr, jnp.full((pad,), fill, arr.dtype)]
                )
            tiled.append(arr.reshape(T, TILE))
        sorted2d = jax.lax.sort(
            tuple(tiled), num_keys=nk, is_stable=True, dimension=-1
        )
        cands = tuple(op[:, :limit].reshape(-1) for op in sorted2d)
        final = jax.lax.sort(cands, num_keys=nk, is_stable=True)
        perm_small = final[-1][:limit]
        out = block.take(perm_small)
        count = jnp.sum(live, dtype=jnp.int32)
        kept = jnp.arange(limit, dtype=jnp.int32) < count
        return out.with_sel(kept)

    fast = (
        len(sort_keys) == 1
        and block[sort_keys[0].name].validity is None
        and not block[sort_keys[0].name].dtype.is_float
        and block[sort_keys[0].name].data.dtype.itemsize <= 4
    )
    if fast:
        sk = sort_keys[0]
        data = block[sk.name].data.astype(jnp.int64)
        rank = data if sk.desc else -data  # top_k takes maxima
        rank = jnp.where(live, rank, jnp.iinfo(jnp.int64).min)
        _, idx = jax.lax.top_k(rank, limit)
        out = block.take(idx)
        kept = jnp.take(live, idx)
        return out.with_sel(kept)

    # sort only (keys, row-index); gather the payload for just the first
    # ``limit`` rows — permuting every column costs ~15x the sort itself
    # (measured: full 6M permute 250ms vs 16ms sort)
    live = block.sel_mask()
    operands: List[jnp.ndarray] = [~live]
    for sk in sort_keys:
        operands.extend(_sort_operand(block[sk.name], sk.desc, sk.nulls_first_resolved))
    nk = len(operands)
    operands.append(jnp.arange(n, dtype=jnp.int32))
    out_ops = jax.lax.sort(tuple(operands), num_keys=nk, is_stable=True)
    perm_small = out_ops[-1][:limit]
    out = block.take(perm_small)
    count = jnp.sum(live, dtype=jnp.int32)
    kept = jnp.arange(limit, dtype=jnp.int32) < count
    return out.with_sel(kept)


def limit_block(block: Block, limit: int) -> Block:
    """LIMIT without ordering: keep the first ``limit`` live rows."""
    live = block.sel_mask()
    rank = jnp.cumsum(live.astype(jnp.int32))
    return block.and_sel(live & (rank <= limit))


__all__ = ["SortKey", "sort_block", "top_n", "limit_block"]
