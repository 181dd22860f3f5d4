"""topn100m stage breakdown (VERDICT r4 item 7): where do the ~16%
between the measured end-to-end (61.1 ms) and the 51.6 ms one-pass
tile-sort floor go?

Stages (each a carry-chained fused measurement over the same 100M int64
key column):

  rank       _single_key_rank build + fold (the 800MB key read + pack)
  level1     rank + one (T, 2048) lax.top_k(100) pass (the floor's op,
             but over the REAL rank, not a pre-staged tile array)
  cascade    rank + full _topk_tiled cascade (all levels + final sort)
  e2e        the full top_n over a Block (adds the 100-row payload take)
  w4096/w8192  level1 with wider tiles (fewer survivors for the cascade)

Emits one JSON line. Honest-measurement rules per CLAUDE.md (fused
fori_loop chains, carry perturbation, checksum every byte).
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

import tiflash_tpu  # noqa: F401
from tiflash_tpu.core import dtypes as dt
from tiflash_tpu.core.block import Block, Column

N = 100_000_000
LIMIT = 100
log = lambda m: print(m, file=sys.stderr, flush=True)


def chain_time(step, args, k1=4, k2=12):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(carry, K):
        return jax.lax.fori_loop(0, K, lambda i, c: step(args, c), carry)

    seed = [0]

    def run(K):
        seed[0] += 1
        t0 = time.time()
        _ = int(chain(jnp.int64(seed[0] * 997), K))
        return time.time() - t0

    run(1)
    t1 = min(run(k1) for _ in range(2))
    t2 = min(run(k2) for _ in range(2))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    key = (jax.random.bits(jax.random.PRNGKey(7), (N,), dtype=jnp.uint64)
           >> jnp.uint64(2)).astype(jnp.int64)
    jax.block_until_ready(key)
    blk = Block(names=("k",), columns=(Column(key, None, dt.INT64),),
                sel=None)
    from tiflash_tpu.ops.sort import (SortKey, _single_key_rank,
                                      _topk_tiled, top_n)

    sks = [SortKey("k", desc=True)]
    out = {}

    def perturbed(carry):
        return Block(names=("k",), columns=(
            Column(key ^ (carry & jnp.int64(1)), None, dt.INT64),),
            sel=None)

    def s_rank(args, carry):
        b = perturbed(carry)
        r = _single_key_rank(b, sks)
        return jnp.sum(r) + carry * jnp.int64(0x9E3779B1)

    log("[rank]")
    out["rank_ms"] = round(chain_time(s_rank, ()) * 1e3, 2)

    def level1(args, carry, tile):
        b = perturbed(carry)
        r = _single_key_rank(b, sks)
        T = -(-N // tile)
        pad = T * tile - N
        if pad:
            r = jnp.concatenate(
                [r, jnp.full((pad,), jnp.iinfo(jnp.int64).min)])
        v, i = jax.lax.top_k(r.reshape(T, tile), LIMIT)
        return (jnp.sum(v) + jnp.sum(i.astype(jnp.int64))
                + carry * jnp.int64(0x9E3779B1))

    for tile in (2048, 4096, 8192):
        log(f"[level1 w{tile}]")
        out[f"level1_w{tile}_ms"] = round(
            chain_time(functools.partial(
                lambda a, c, t: level1(a, c, t), t=tile), ()) * 1e3, 2)

    def s_cascade(args, carry):
        b = perturbed(carry)
        r = _single_key_rank(b, sks)
        res = _topk_tiled(b, r, LIMIT, 2048)
        return (jnp.sum(jnp.where(res.sel_mask(),
                                  res["k"].data.astype(jnp.int64), 0))
                + carry * jnp.int64(0x9E3779B1))

    log("[cascade]")
    out["cascade_ms"] = round(chain_time(s_cascade, ()) * 1e3, 2)

    def s_e2e(args, carry):
        b = perturbed(carry)
        res = top_n(b, sks, LIMIT)
        return (jnp.sum(jnp.where(res.sel_mask(),
                                  res["k"].data.astype(jnp.int64), 0))
                + carry * jnp.int64(0x9E3779B1))

    log("[e2e]")
    out["e2e_ms"] = round(chain_time(s_e2e, ()) * 1e3, 2)

    out["n"] = N
    out["limit"] = LIMIT
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
