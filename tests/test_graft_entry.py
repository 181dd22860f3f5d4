"""Driver entry points must stay importable and jittable."""

import sys

import jax
import numpy as np


def test_entry_jits_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.names[0] == "l_returnflag"
    assert int(np.asarray(out.num_rows())) >= 3


def test_dryrun_multichip_small():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(4)
