"""Stage breakdown for the 100M topN config: which per-tile selection
primitive is cheapest on the chip — 1-op tile sort (keys only), 2-op
tile sort (key + row id), lax.top_k per tile, or sort_key_val?  The
current implementation measures 104ms vs the 51.6ms 1-op tile-sort
floor; the suspect is a second sort operand."""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

import tiflash_tpu  # noqa: F401

sys.path.insert(0, "/root/repo/tools")
from measure_primitives import chain_time  # noqa: E402


def main():
    log = lambda m: print(m, file=sys.stderr, flush=True)
    N = 100_000_000
    T = N // 2048
    k = (jax.random.bits(jax.random.PRNGKey(1), (T * 2048,), dtype=jnp.uint64)
         >> jnp.uint64(1)).astype(jnp.int64).reshape(T, 2048)
    iota = jnp.broadcast_to(
        jnp.arange(2048, dtype=jnp.int32)[None, :], (T, 2048))
    jax.block_until_ready((k, iota))
    out = {}

    def s1(arrays, carry):
        x = arrays[0] ^ (carry & jnp.int64(1))
        s = jax.lax.sort(x, dimension=1)
        return jnp.sum(s[:, -1]) + jnp.sum(s[:, 0]) + carry * jnp.int64(0x9E3779B1)

    log("[tile 1-op sort]")
    out["sort1"] = round(chain_time(s1, (k,), log=log) * 1e3, 2)

    def s2(arrays, carry):
        x = arrays[0] ^ (carry & jnp.int64(1))
        sk, si = jax.lax.sort((x, arrays[1]), dimension=1, num_keys=1)
        return (jnp.sum(sk[:, -1]) + jnp.sum(si[:, -1].astype(jnp.int64))
                + carry * jnp.int64(0x9E3779B1))

    log("[tile 2-op sort key+int32 id]")
    out["sort2_i32"] = round(chain_time(s2, (k, iota), log=log) * 1e3, 2)

    def tk(arrays, carry):
        x = arrays[0] ^ (carry & jnp.int64(1))
        v, i = jax.lax.top_k(x, 100)
        return (jnp.sum(v[:, -1]) + jnp.sum(i[:, -1].astype(jnp.int64))
                + carry * jnp.int64(0x9E3779B1))

    log("[tile top_k 100]")
    out["topk100"] = round(chain_time(tk, (k,), log=log) * 1e3, 2)

    def tk8(arrays, carry):
        x = arrays[0] ^ (carry & jnp.int64(1))
        v, i = jax.lax.top_k(x, 128)
        return (jnp.sum(v[:, -1]) + jnp.sum(i[:, -1].astype(jnp.int64))
                + carry * jnp.int64(0x9E3779B1))

    log("[tile top_k 128]")
    out["topk128"] = round(chain_time(tk8, (k,), log=log) * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
