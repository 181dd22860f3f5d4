"""Multi-host MPP validation: two real OS processes, jax.distributed over
Gloo, 2 CPU devices per process (4 global).

Role analog: ``Flash/tests/gtest_compute_server.cpp`` — the reference
tests multi-node MPP without a cluster; here the driver spawns two
worker processes (tests/multihost_worker.py) that each hold only their
half of the data, assemble global tables via ``shard_local_blocks``, run
a distributed aggregation + shuffle join, and must both report the exact
oracle result.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import tiflash_tpu.core.dtypes as dt
from tiflash_tpu.testing import oracle as O

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    # identical deterministic tables as the worker builds them
    rng = np.random.default_rng(11)
    t = O.random_pytable(rng, 512, {"k": dt.INT32, "v": dt.INT64},
                         int_range=(0, 23))
    r = O.random_pytable(rng, 128, {"rk": dt.INT32, "rv": dt.INT64},
                         int_range=(0, 23))
    want_agg = O.o_aggregate(t, ["k"], [("sum", "v", "s"),
                                        ("count", None, "c")])
    want_join = O.o_join(t, r, ["k"], ["rk"], kind="inner")

    for out in outs:  # every process must see the same, correct result
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, f"no RESULT line in worker output:\n{out[-2000:]}"
        got = json.loads(line[-1][len("RESULT"):])
        O.assert_tables_equal(got["agg"], want_agg)
        O.assert_tables_equal(got["join"], want_join)
