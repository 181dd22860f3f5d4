"""Skew-aware shuffle join: sampled heavy hitters take a broadcast path.

Role analog: the reference has no single mechanism for this — it spreads
skew handling across fine-grained shuffle lanes
(``docs/design/2022-06-14-fine-grained-shuffle.md``) and per-partition
spill; BASELINE.md config 4 (skewed-key shuffle join at >=80% scaling)
makes it first-class here.

Mechanism (all inside the jitted SPMD program):
1. every device takes a strided sample of its probe join keys and
   all-gathers it (tiny: P x sample);
2. each device identically computes the sampled histogram and picks keys
   whose sampled frequency exceeds ~1/(2P) — the keys that would overload
   one partition — into a sorted hot set H (<= hot_k, padded);
3. probe rows with keys in H stay LOCAL (no exchange at all — they are
   already uniformly spread across devices by data placement); the rest
   hash-shuffle as usual;
4. build rows with keys in H broadcast to every device; the rest
   hash-shuffle;
5. two local joins (hot-local x hot-broadcast, cold x cold) — their
   concatenation is exactly the join result (each key class is routed to
   exactly one path).

Correct for inner/left/semi/anti (probe rows processed exactly once);
right-outer is excluded (broadcast build rows would need cross-device
matched-flag reduction).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.block import Block, Column
from ..ops import join as J
from .shuffle import allgather_block, shuffle_block


def concat_blocks(a: Block, b: Block) -> Block:
    """Row-concatenate two blocks with identical column names; nullability
    is unioned (an outer-join tail contributes NULL-filled columns)."""
    assert a.names == b.names, (a.names, b.names)
    cols = []
    for ca, cb in zip(a.columns, b.columns):
        data = jnp.concatenate([ca.data, cb.data.astype(ca.data.dtype)])
        if ca.validity is None and cb.validity is None:
            validity = None
        else:
            validity = jnp.concatenate([ca.valid_mask(), cb.valid_mask()])
        dt = ca.dtype.with_nullable(ca.dtype.nullable or cb.dtype.nullable)
        st = None
        if ca.stats is not None and cb.stats is not None:
            st = (min(ca.stats[0], cb.stats[0]), max(ca.stats[1], cb.stats[1]))
        cols.append(Column(data, validity, dt, ca.dictionary, stats=st))
    sel = jnp.concatenate([a.sel_mask(), b.sel_mask()])
    return Block(names=a.names, columns=tuple(cols), sel=sel)


def detect_hot_keys(
    keys: jnp.ndarray,
    live: jnp.ndarray,
    axis_name: str,
    sample_per_device: int = 2048,
    hot_k: int = 128,
    hot_frac_denom: int = 2,
) -> jnp.ndarray:
    """Sorted hot-key set (int64, padded with INT64_MAX sentinel)."""
    n = keys.shape[0]
    P = jax.lax.axis_size(axis_name)
    s = min(sample_per_device, n)
    stride = max(1, n // s)
    idx = jnp.arange(s, dtype=jnp.int32) * stride
    sent = jnp.int64(2**63 - 1)
    samp = jnp.where(jnp.take(live, idx), jnp.take(keys, idx), sent)
    all_samp = jax.lax.all_gather(samp, axis_name).reshape(-1)  # (P*s,)
    sorted_s = jnp.sort(all_samp)
    total = sorted_s.shape[0]
    first = (sorted_s != jnp.roll(sorted_s, 1)).at[0].set(True)
    # run length per element (the sample is tiny, so two binary searches
    # beat a scan)
    counts = jnp.searchsorted(sorted_s, sorted_s, side="right") - jnp.searchsorted(
        sorted_s, sorted_s, side="left"
    )
    threshold = jnp.maximum(2, total // (P * hot_frac_denom))
    hot_mask = first & (counts >= threshold) & (sorted_s != sent)
    # rank hot candidates by count, keep top hot_k
    hot_k = min(hot_k, total)
    score = jnp.where(hot_mask, counts, -1)
    _, top_idx = jax.lax.top_k(score, hot_k)
    hot_keys = jnp.where(
        jnp.take(score, top_idx) > 0, jnp.take(sorted_s, top_idx), sent
    )
    return jnp.sort(hot_keys)


def _isin_sorted(keys: jnp.ndarray, sorted_set: jnp.ndarray) -> jnp.ndarray:
    pos = jnp.searchsorted(sorted_set, keys, method="sort")
    pos = jnp.minimum(pos, sorted_set.shape[0] - 1)
    return jnp.take(sorted_set, pos) == keys


def skew_shuffle_join(
    probe_block: Block,
    build_block: Block,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    kind: str,
    axis_name: str,
    shuffle_capacity: int,
    build_shuffle_capacity: int,
    output_capacity: Optional[int],
    hot_output_capacity: Optional[int] = None,
    hot_k: int = 128,
    sample_per_device: int = 2048,
) -> Tuple[Block, Dict[str, jnp.ndarray]]:
    """The full hybrid join.  Returns (result, overflow dict)."""
    assert kind in ("inner", "left", "left_outer", "semi", "anti"), kind
    pk_cols = [probe_block[k] for k in probe_keys]
    bk_cols = [build_block[k] for k in build_keys]
    pkeys, pnull, bkeys, bnull = J.normalize_join_keys(pk_cols, bk_cols)

    hot = detect_hot_keys(
        pkeys, probe_block.sel_mask() & ~pnull, axis_name,
        sample_per_device=sample_per_device, hot_k=hot_k,
    )

    p_hot = _isin_sorted(pkeys, hot) & ~pnull
    b_hot = _isin_sorted(bkeys, hot) & ~bnull

    overflows: Dict[str, jnp.ndarray] = {}

    # cold sides: standard hash shuffle
    cold_probe, ovp = shuffle_block(
        probe_block.and_sel(~p_hot), list(probe_keys), axis_name, shuffle_capacity
    )
    cold_build, ovb = shuffle_block(
        build_block.and_sel(~b_hot), list(build_keys), axis_name,
        build_shuffle_capacity,
    )
    overflows["skew_probe_shuffle"] = ovp
    overflows["skew_build_shuffle"] = ovb

    # hot: probe stays local, build broadcasts
    hot_probe = probe_block.and_sel(p_hot)
    hot_build = allgather_block(build_block.and_sel(b_hot), axis_name)

    cold_joined, cold_extras = J.hash_join(
        cold_probe, cold_build, list(probe_keys), list(build_keys),
        kind=kind, output_capacity=output_capacity,
    )
    hot_joined, hot_extras = J.hash_join(
        hot_probe, hot_build, list(probe_keys), list(build_keys),
        kind=kind, output_capacity=hot_output_capacity or output_capacity,
    )
    overflows["skew_cold_join"] = cold_extras["overflow"]
    overflows["skew_hot_join"] = hot_extras["overflow"]

    return concat_blocks(cold_joined, hot_joined), overflows


__all__ = ["skew_shuffle_join", "detect_hot_keys", "concat_blocks"]
