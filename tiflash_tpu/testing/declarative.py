"""Declarative query-test runner.

Role analog: the reference's ``.test`` files
(``tests/fullstack-test/*.test``: mysql> statements + expected tables,
run by ``tests/run-test.py``) — here JSON cases with inline tables, a
serialized plan, and expected output rows.  Each case runs through BOTH
the single-chip compiler and the 8-device distributed runner and must
match the expected rows exactly (order-insensitive unless ``ordered``).

Case format::

    {
      "name": "...",
      "tables": {"t": {"schema": {"k": {"kind": "i64"}}, "rows": {"k": [..]}}},
      "plan": { ... serde plan json ... },
      "expect": {"col": [values...]},
      "ordered": false,
      "distributed": true       # also run on the mesh (default true)
    }
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Dict

import numpy as np

from ..plan import serde
from ..plan.compiler import compile_fragment
from . import oracle as O


def _decode_value(v, dt):
    from ..core.dtypes import TypeKind
    from decimal import Decimal as D

    if v is None:
        return None
    if dt.is_decimal:
        return D(str(v))
    if dt.kind is TypeKind.DATE and isinstance(v, str):
        return datetime.date.fromisoformat(v)
    return v


def load_case(path: str) -> Dict:
    with open(path) as f:
        return json.load(f)


def run_case(case: Dict, mesh=None) -> None:
    schemas = {
        t: {c: serde.dtype_from_json(d) for c, d in spec["schema"].items()}
        for t, spec in case["tables"].items()
    }
    pytables = {
        t: {
            c: [_decode_value(v, schemas[t][c]) for v in vals]
            for c, vals in spec["rows"].items()
        }
        for t, spec in case["tables"].items()
    }
    blocks = {
        t: O.pytable_to_block(pytables[t], schemas[t]) for t in pytables
    }
    plan = serde.plan_from_json(case["plan"])
    expect = {
        c: [
            _decode_value(v, _expect_dtype(v))
            for v in vals
        ]
        for c, vals in case["expect"].items()
    }

    out, overflows = compile_fragment(plan)(blocks)
    for k, v in overflows.items():
        assert int(v) == 0, (case["name"], k)
    got = O.block_to_pytable(out)
    O.assert_tables_equal(got, _normalize(expect, got), ordered=case.get("ordered", False))

    if mesh is not None and case.get("distributed", True):
        from ..plan.auto import distribute_plan
        from ..runtime.executor import run_query

        stats = {t: b.capacity for t, b in blocks.items()}
        n_dev = int(np.prod(list(mesh.shape.values()))) if mesh else 1
        dist = distribute_plan(serde.plan_from_json(case["plan"]), stats, n_dev)
        dout, _ = run_query(dist, blocks, mesh=mesh)
        dgot = O.block_to_pytable(dout)
        O.assert_tables_equal(dgot, _normalize(expect, dgot),
                              ordered=False)  # shuffles reorder rows


def _expect_dtype(v):
    from ..core import dtypes as dt

    return dt.INT64  # placeholder; literals decode below in _normalize


def _normalize(expect: Dict, got: Dict) -> Dict:
    """Coerce expected literals to the got-value types (decimal strings,
    ISO dates) so authors can write plain JSON."""
    from decimal import Decimal as D

    out = {}
    for cname, vals in expect.items():
        gvals = got.get(cname, [])
        sample = next((g for g in gvals if g is not None), None)
        conv = []
        for v in vals:
            if v is None:
                conv.append(None)
            elif isinstance(sample, D):
                conv.append(D(str(v)))
            elif isinstance(sample, datetime.date) and isinstance(v, str):
                conv.append(datetime.date.fromisoformat(v))
            elif isinstance(sample, bool):
                conv.append(bool(v))
            else:
                conv.append(v)
        out[cname] = conv
    return out


def discover_cases(directory: str):
    for fn in sorted(os.listdir(directory)):
        if fn.endswith(".json"):
            yield os.path.join(directory, fn)


__all__ = ["run_case", "load_case", "discover_cases"]
