"""Segment-boundary fills without monotone accumulates.

``jnp.maximum.accumulate`` / ``minimum.accumulate`` lower pathologically
on TPU (measured 34 s over 6M int64 — vs 7 ms for ``cumsum``).  The
equivalent forward/backward fills here cost one int32 cumsum, one
unique-index scatter, and one gather (~80 ms at 6M).
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_fill_positions(flags: jnp.ndarray) -> jnp.ndarray:
    """Position (int32) of the most recent True at or before each row.
    ``flags[0]`` must be True."""
    n = flags.shape[0]
    gid = jnp.cumsum(flags.astype(jnp.int32)) - 1
    pos = jnp.arange(n, dtype=jnp.int32)
    starts = jnp.zeros(n + 1, dtype=jnp.int32).at[
        jnp.where(flags, gid, n)
    ].set(pos, mode="drop")[:n]
    return jnp.take(starts, jnp.maximum(gid, 0))


def backward_fill_positions(flags: jnp.ndarray) -> jnp.ndarray:
    """Position (int32) of the nearest True at or after each row.
    ``flags[-1]`` must be True."""
    n = flags.shape[0]
    rev = forward_fill_positions(jnp.flip(flags))
    return (n - 1) - jnp.flip(rev)


__all__ = ["forward_fill_positions", "backward_fill_positions"]
