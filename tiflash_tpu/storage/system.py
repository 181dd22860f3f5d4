"""System tables: engine introspection as queryable blocks.

Role analog: ``Storages/System/`` (``system.dt_tables``,
``system.metrics``, ``system.processes``) — here generated on demand from
the metrics registry, settings, and catalog state, so any plan can scan
them like ordinary tables (``TableScan("system_metrics")``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from ..core import dtypes as dt
from ..core.block import Block
from ..runtime.metrics import METRICS
from ..runtime.settings import Settings
from .catalog import Catalog, column_from_arrays, encode_strings


def _string_col(values):
    codes, d = encode_strings(np.array([str(v) for v in values], dtype=object))
    return column_from_arrays(codes, dt.STRING, dictionary=d)


def system_blocks(
    catalog: Optional[Catalog] = None,
    settings: Optional[Settings] = None,
    queries: Optional[list] = None,
) -> Dict[str, Block]:
    out: Dict[str, Block] = {}

    m = METRICS.dump()
    out["system_metrics"] = Block.from_dict({
        "name": _string_col(list(m.keys())),
        "value": column_from_arrays(
            np.array(list(m.values()), dtype=np.float64), dt.FLOAT64
        ),
    })

    s = settings or Settings()
    names, vals = [], []
    for f in dataclasses.fields(s):
        names.append(f.name)
        vals.append(getattr(s, f.name))
    out["system_settings"] = Block.from_dict({
        "name": _string_col(names),
        "value": _string_col(vals),
    })

    if catalog is not None:
        tnames, rows, ncols = [], [], []
        for name, t in catalog.tables.items():
            tnames.append(name)
            rows.append(t.row_count)
            ncols.append(len(t.schema))
        out["system_tables"] = Block.from_dict({
            "table": _string_col(tnames),
            "rows": column_from_arrays(np.array(rows, dtype=np.int64), dt.INT64),
            "columns": column_from_arrays(np.array(ncols, dtype=np.int64), dt.INT64),
        })

    if queries is not None and queries:
        out["system_queries"] = Block.from_dict({
            "id": column_from_arrays(
                np.array([q["id"] for q in queries], dtype=np.int64), dt.INT64
            ),
            "state": _string_col([q["state"] for q in queries]),
        })
    return out


__all__ = ["system_blocks"]
