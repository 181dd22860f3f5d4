"""Pallas TPU kernel: direct-indexed group-by sum/count at HBM speed.

Role analog: the hot loop of ``Aggregator::executeImplBatch``
(``Interpreters/Aggregator.cpp:776``) for the direct-key methods
(AggregationMethod_key8/16).  XLA's ``segment_sum`` lowers to a serialized
scatter on TPU (~160x off roofline); this kernel instead turns the
grouped accumulation into MXU matmuls:

  per chunk of rows:  acc += one_hot(slots)ᵀ · limbs(values)

where int64 values are decomposed into 8-bit limbs so the f32 matmul is
*exact* per chunk (max 255 · 8192 < 2²⁴) and accumulated in int32 across
chunks (< 2³¹ for ≤ 8M rows); the final limb recombination happens in
int64 modulo 2⁶⁴, which makes two's-complement negatives come out exactly.

Supports sum over int64/decimal mantissas and counts (a ones-column ride
along in the same matmul).  Float sums and min/max stay on the XLA path.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LIMBS = 8          # 8 x 8-bit limbs cover 64 bits
CHUNK = 8192       # rows per grid step
ROW_CAP = 7_500_000  # int32 acc safety: 255 * ROW_CAP < 2^31


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(n_rows, s_pad, k_pad, n_vals, slots_ref, *refs):
    # NOTE: all scalar constants below are explicitly typed — under
    # jax_enable_x64 a bare python int becomes a weak int64, and Mosaic's
    # convert-element-type lowering recurses forever on weak-int64->int32.
    vals_refs = refs[: n_vals]
    out_ref, acc_ref = refs[n_vals], refs[n_vals + 1]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # row-validity mask for the ragged tail
    base = i * jnp.int32(CHUNK)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]
    in_bounds = (base + row_ids) < jnp.int32(n_rows)

    slots = jnp.where(in_bounds, slots_ref[0, :], jnp.int32(s_pad - 1))
    oh = (
        slots[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (CHUNK, s_pad), 1)
    ).astype(jnp.float32)

    cols: List[jnp.ndarray] = []
    mask255 = jnp.int32(255)
    for vr in vals_refs:
        lo = vr[0, :]
        hi = vr[1, :]
        for j in range(4):
            cols.append(((lo >> jnp.int32(8 * j)) & mask255).astype(jnp.float32))
        for j in range(4):
            cols.append(((hi >> jnp.int32(8 * j)) & mask255).astype(jnp.float32))
    # ones column for row counts (masked by in_bounds via one-hot row zeroing)
    cols.append(jnp.ones((CHUNK,), dtype=jnp.float32))
    while len(cols) < k_pad:
        cols.append(jnp.zeros((CHUNK,), dtype=jnp.float32))
    limbs = jnp.stack(cols, axis=1)  # (CHUNK, k_pad)

    part = jax.lax.dot_general(
        oh, limbs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (s_pad, k_pad)
    acc_ref[...] += part.astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _direct_sums_once(
    slots: jnp.ndarray,
    vals32: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    n_slots: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One kernel invocation (<= ROW_CAP rows).

    Returns (sums int64 (n_slots, V), slot_counts int64 (n_slots,))."""
    n = int(slots.shape[0])
    n_vals = len(vals32)
    s_pad = _round_up(n_slots + 1, 8)  # +1 trash slot for dead rows
    k_pad = _round_up(n_vals * LIMBS + 1, 128)
    grid = pl.cdiv(n, CHUNK)

    # NOTE: index maps must not contain bare python-int zeros — under
    # jax_enable_x64 they lower as i64 and Mosaic fails to legalize the
    # index-map function's return.  Derive 0 from the int32 grid index.
    in_specs = [
        pl.BlockSpec((1, CHUNK), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
    ]
    args = [slots.reshape(1, n)]
    for lo, hi in vals32:
        in_specs.append(
            pl.BlockSpec((2, CHUNK), lambda i: (i * 0, i), memory_space=pltpu.VMEM)
        )
        args.append(jnp.stack([lo, hi]))

    acc = pl.pallas_call(
        functools.partial(_kernel, n, s_pad, k_pad, n_vals),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (s_pad, k_pad), lambda i: (i * 0, i * 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s_pad, k_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((s_pad, k_pad), jnp.int32)],
        interpret=interpret,
    )(*args)

    acc = acc[: n_slots + 1]  # drop padding rows (keep trash for counts? no)
    acc_u = acc[:n_slots].astype(jnp.uint64)
    sums = []
    for v in range(n_vals):
        s = jnp.zeros(n_slots, dtype=jnp.uint64)
        for j in range(LIMBS):
            s = s + (acc_u[:, v * LIMBS + j] << jnp.uint64(8 * j))
        sums.append(s.astype(jnp.int64))
    sums_arr = (
        jnp.stack(sums, axis=1) if sums else jnp.zeros((n_slots, 0), jnp.int64)
    )
    counts = acc[:n_slots, n_vals * LIMBS].astype(jnp.int64)
    return sums_arr, counts


def direct_sums(
    slots: jnp.ndarray,
    values: Sequence[jnp.ndarray],
    masks: Sequence[Optional[jnp.ndarray]],
    live: jnp.ndarray,
    n_slots: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray]]:
    """Grouped sums + counts for int64 value columns.

    slots: int32 (n,) in [0, n_slots); dead rows may hold anything — they
    are routed to the trash slot via ``live``.
    values[v]: int64 (n,); masks[v]: per-value validity or None.
    Returns (sums (n_slots, V) int64, live_counts (n_slots,) int64,
    per-value non-null counts list).

    Per-value NULL handling: masked values contribute 0 to sums; non-null
    counts are computed with an extra masked ones pass through the same
    kernel (packed as a value column of 0/1).
    """
    n = int(slots.shape[0])
    slots = jnp.where(live, slots, jnp.int32(n_slots)).astype(jnp.int32)

    vals32: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for v, m in zip(values, masks):
        v = v.astype(jnp.int64)
        if m is not None:
            v = jnp.where(m, v, 0)
        pair = jax.lax.bitcast_convert_type(v, jnp.int32)  # (n, 2)
        vals32.append((pair[:, 0], pair[:, 1]))
    # per-value non-null counters as 0/1 int32 columns (lo only)
    nn_idx: List[int] = []
    for v, m in zip(values, masks):
        if m is not None:
            ones = (m & live).astype(jnp.int32)
            vals32.append((ones, jnp.zeros_like(ones)))
            nn_idx.append(len(vals32) - 1)
        else:
            nn_idx.append(-1)

    if n <= ROW_CAP:
        sums, counts = _direct_sums_once(slots, vals32, n_slots, interpret)
    else:
        parts = []
        for s0 in range(0, n, ROW_CAP):
            e = min(s0 + ROW_CAP, n)
            parts.append(
                _direct_sums_once(
                    slots[s0:e], [(a[s0:e], b[s0:e]) for a, b in vals32],
                    n_slots, interpret,
                )
            )
        sums = sum(p[0] for p in parts)
        counts = sum(p[1] for p in parts)

    V = len(values)
    value_sums = sums[:, :V]
    nn_counts: List[jnp.ndarray] = []
    for i, ix in enumerate(nn_idx):
        if ix < 0:
            nn_counts.append(counts)
        else:
            nn_counts.append(sums[:, ix])
    return value_sums, counts, nn_counts


__all__ = ["direct_sums", "CHUNK", "ROW_CAP"]
