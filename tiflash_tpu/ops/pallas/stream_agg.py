"""Pallas TPU kernel: streaming VPU group-by accumulation.

Role analog: the hot loop of ``Aggregator::executeImplBatch``
(``/root/reference/dbms/src/Interpreters/Aggregator.cpp:776``) for the
direct-key methods — re-designed for the VPU instead of a hash table.

Design (ROADMAP round-2 priority: NOT the one-hot MXU kernel, which is
K-bound at one row per MXU cycle):

- Rows stream through VMEM in (64, 128) int tiles, STEP_TILES sub-tiles
  per grid step (65536 rows per step — batching amortizes the measured
  ~0.4 us fixed per-step cost).
- The caller provides a traced ``make_tile_values`` that maps the raw
  input tiles to (slot ids, limb columns): the scan's filter, projection
  arithmetic and key packing all happen INSIDE the kernel on VMEM tiles,
  so projected columns never round-trip through HBM.
- Each limb column is a non-negative int32 < 2**limb_bits (the fused-scan
  compiler splits wide values into weighted limbs using column min/max
  stats).  Accumulation is ``acc[s,l] += where(slot==s, limb, 0)`` into
  per-(slot, limb) full-tile int32 accumulators — two VPU ops per
  (slot, limb) per element, no scatter, no hash table, no matmul.
- Periodic flush ("periodic carry"): every FLUSH_STEPS grid steps (=
  FLUSH_TILES sub-tiles) the int32 accumulator block is written back to a
  fresh HBM chunk slot and re-zeroed, so each element accumulates at most
  FLUSH_TILES values of
  < 2**limb_bits — with FLUSH_TILES * 2**limb_bits <= 2**31 the int32
  accumulation is exact for UNBOUNDED row counts, and limbs can be
  25 bits wide instead of 16 (fewer planes -> less VPU work).
- The (chunks, slots*limbs*64, 128) int32 output is reduced to int64
  limb sums outside in XLA: a few MB once per scan, and the kernel never
  touches int64 (Mosaic emulates i64 as 2xi32 and cannot even lower
  i64->i32 converts — measured RecursionError).

All scalar constants are explicitly typed (x64 is on: bare python ints
become weak int64 and break Mosaic lowering — see CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MUL_SPLIT_BITS = 16    # factor-splitting width for wide products (fixed)
FLUSH_TILES = 64       # accumulate sub-tiles between accumulator flushes
ACC_LIMB_BITS = 25     # FLUSH_TILES * 2**ACC_LIMB_BITS == 2**31: exact
TILE_SUB = 64          # sublane rows per tile
TILE_LANES = 128
TILE = TILE_SUB * TILE_LANES  # 8192 rows per accumulate sub-tile
# Sub-tiles processed per GRID step.  Measured (v5e): the kernel carries
# ~0.4 us of fixed cost per grid step (memfloor probe: S=1/L=1 over 6M
# rows ran 0.36 ms against a 0.06 ms HBM floor at 733 steps) — batching 8
# sub-tiles per step divides that overhead by 8 while the VMEM working
# set stays small (inputs 8x256 KB double-buffered + accumulator).
STEP_TILES = 8
STEP_ROWS = STEP_TILES * TILE           # 65536 rows per grid step
FLUSH_STEPS = FLUSH_TILES // STEP_TILES  # grid steps between flushes


def _kernel(n_rows, n_slots, n_limbs, n_inputs, make_tile_values, names,
            *refs):
    in_refs = refs[:n_inputs]
    acc_ref = refs[n_inputs]
    i = pl.program_id(0)

    @pl.when(jax.lax.rem(i, jnp.int32(FLUSH_STEPS)) == jnp.int32(0))
    def _():
        # fresh chunk slot (the previous block was auto-written back when
        # the output block index advanced)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    step: Dict[str, jnp.ndarray] = {nm: r[...] for nm, r in zip(names, in_refs)}
    zero = jnp.zeros((TILE_SUB, TILE_LANES), dtype=jnp.int32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANES), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, TILE_LANES), 1)
    for r in range(STEP_TILES):
        # global row ids of this (64, 128) sub-tile for the ragged tail mask
        base = i * jnp.int32(STEP_ROWS) + jnp.int32(r * TILE)
        rid = base + iota_s * jnp.int32(TILE_LANES) + iota_l
        in_bounds = rid < jnp.int32(n_rows)

        tile = {nm: v[r * TILE_SUB:(r + 1) * TILE_SUB, :]
                for nm, v in step.items()}
        slots, limbs = make_tile_values(tile, in_bounds)
        assert len(limbs) == n_limbs, (len(limbs), n_limbs)

        for s in range(n_slots):
            m = slots == jnp.int32(s)
            for l, v in enumerate(limbs):
                k = s * n_limbs + l
                acc_ref[0, k * TILE_SUB:(k + 1) * TILE_SUB, :] += jnp.where(
                    m, v, zero
                )


def stream_group_sums(
    inputs: Dict[str, jnp.ndarray],
    make_tile_values: Callable,
    n_slots: int,
    n_limbs: int,
    n_rows: int,
    interpret: bool = False,
    plane_fields=None,
) -> jnp.ndarray:
    """Run the streaming accumulation kernel.

    ``inputs``: 1-D device arrays (int32/bool) of length ``n_rows`` OR
      already padded to the full-tile multiple (storage-level narrow32
      shadows arrive pre-padded — zero staging copies).
    ``make_tile_values(tile_dict, in_bounds) -> (slots int32, [limb int32])``
      traced inside the kernel per (64, 128) tile; each limb value must be
      in [0, 2**ACC_LIMB_BITS); rows with ``slot not in [0, n_slots)``
      contribute nothing (dead/filtered rows).
    ``plane_fields``: optional PACKED-plane layout — per plane a list of
      ``(bit_offset, capacity_bits, out_index)`` fields.  Small limbs
      share one accumulator plane at disjoint bit offsets (each field's
      flush-window growth stays under its capacity, so fields never
      carry into each other per element); the reduction extracts fields
      PER ELEMENT before summing (a summed plane would bleed across
      offsets).  Cuts the kernel's per-(slot, plane) accumulate passes —
      the dominant VPU cost for multi-aggregate scans like Q1.
    Returns (n_slots, n_limbs) int64 limb sums — with ``plane_fields``,
    (n_slots, n_fields) ordered by ``out_index``.
    """
    names = list(inputs)
    n = n_rows
    grid = max(1, -(-n // STEP_ROWS))
    n128 = grid * STEP_TILES * TILE_SUB
    padded = n128 * TILE_LANES
    chunks = -(-grid // FLUSH_STEPS)

    args = []
    in_specs = []
    for nm in names:
        arr = inputs[nm]
        assert int(arr.shape[0]) in (n, padded), (nm, arr.shape, n, padded)
        if arr.dtype == jnp.bool_:
            arr = arr.astype(jnp.int32)
        # Mosaic cannot lower i64->i32 converts inside the kernel: the
        # fused-scan stager must pre-narrow / pre-split every input
        assert arr.dtype == jnp.int32, (nm, arr.dtype)
        if int(arr.shape[0]) != padded:
            # ragged pad to a full-tile multiple (padded rows are masked by
            # in_bounds inside the kernel)
            arr = jnp.pad(arr, (0, padded - int(arr.shape[0])))
        args.append(arr.reshape(n128, TILE_LANES))
        in_specs.append(
            pl.BlockSpec(
                (STEP_TILES * TILE_SUB, TILE_LANES),
                lambda i: (i, i * 0),
                memory_space=pltpu.VMEM,
            )
        )

    acc_rows = n_slots * n_limbs * TILE_SUB
    acc = pl.pallas_call(
        functools.partial(
            _kernel, n, n_slots, n_limbs, len(names), make_tile_values, names
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, acc_rows, TILE_LANES),
            lambda i: (i // jnp.int32(FLUSH_STEPS), i * 0, i * 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((chunks, acc_rows, TILE_LANES),
                                       jnp.int32),
        interpret=interpret,
    )(*args)
    # chunk + plane reduction in XLA (chunks * S*L*8192 int32 once per scan)
    r = acc.reshape(chunks, n_slots, n_limbs, TILE_SUB * TILE_LANES)
    if plane_fields is None:
        return r.astype(jnp.int64).sum(axis=(0, 3))
    n_fields = sum(len(fs) for fs in plane_fields)
    outs = [None] * n_fields
    for li, fields in enumerate(plane_fields):
        plane = r[:, :, li, :].astype(jnp.int64)
        for off, cap, oi in fields:
            fld = plane
            if off:
                fld = fld >> jnp.int64(off)
            fld = fld & jnp.int64((1 << cap) - 1)
            outs[oi] = fld.sum(axis=(0, 2))
    return jnp.stack(outs, axis=1)


__all__ = [
    "stream_group_sums", "ACC_LIMB_BITS", "MUL_SPLIT_BITS", "TILE",
    "FLUSH_TILES",
]
