"""Query service: the RPC surface of the engine.

Role analog: L9 of the reference — ``FlashService`` gRPC endpoints
(``Flash/FlashService.h:51``: Coprocessor, DispatchMPPTask, ...) plus the
HTTP status/metrics servers (``Server/MetricsPrometheus.cpp``,
``docs/tiflash_http_api.md``).  gRPC+protobuf buys the reference nothing
we need here (plans arrive as JSON — plan/serde.py is the tipb analog),
so the surface is a small threaded HTTP server:

  POST /query    {"plan": <plan json>, "distributed": bool}
                 -> {"columns": {name: [values...]}, "summary": {...}}
  GET  /metrics  -> flat counter dump (Prometheus-ish, JSON)
  GET  /status   -> tables, devices, backend
  POST /failpoint {"name": ..., "action": "enable"|"disable", "probability": p}

Admission control: a bounded semaphore caps concurrent queries (the
MinTSO-scheduler slot analog — deadlock-freedom is trivial here because
queries never wait on each other's exchanges; they are single programs).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from ..plan.serde import plan_from_json
from ..runtime.executor import QueryRunner
from ..runtime.failpoint import FailPoint, FailPointError
from ..runtime.metrics import METRICS
from ..runtime.settings import Settings
from ..storage.catalog import Catalog


class QueryService:
    def __init__(
        self,
        catalog: Catalog,
        mesh=None,
        settings: Optional[Settings] = None,
        max_concurrency: int = 4,
    ):
        self.catalog = catalog
        self.mesh = mesh
        self.settings = settings or Settings()
        self._admission = threading.BoundedSemaphore(max_concurrency)
        self._blocks = None
        self._lock = threading.Lock()
        # query registry: the MPPTaskManager / process-list analog
        self._qid = 0
        self._queries: Dict[int, Dict] = {}

    def _tables(self):
        with self._lock:
            if self._blocks is None:
                blocks = self.catalog.blocks()
                if self.mesh is not None:
                    from .runner import shard_catalog_blocks

                    blocks = shard_catalog_blocks(blocks, self.mesh)
                self._blocks = blocks
            return self._blocks

    def execute(self, plan_json: Dict, distributed: Optional[bool] = None) -> Dict:
        plan = plan_from_json(plan_json)
        mesh = self.mesh if (distributed is None or distributed) else None
        # system tables are injected fresh per query (single-device scans)
        uses_system = "system_" in json.dumps(plan_json)
        with self._lock:
            self._qid += 1
            qid = self._qid
            self._queries[qid] = {"id": qid, "state": "RUNNING"}
        from ..runtime.logging import get_logger, query_context

        log = get_logger("tiflash_tpu.service")
        try:
            with self._admission, query_context(qid):
                log.info("query %d start", qid)
                tables = self._tables()
                if uses_system:
                    from ..storage.system import system_blocks

                    tables = dict(tables)
                    tables.update(system_blocks(
                        self.catalog, self.settings, self.queries()["queries"]
                    ))
                    mesh = None  # system scans run single-device
                runner = QueryRunner(plan, mesh=mesh, settings=self.settings)
                out, summary = runner.run(tables)
        except Exception:
            with self._lock:
                self._queries[qid]["state"] = "FAILED"
            raise
        cols = out.to_pylists()
        with self._lock:
            self._queries[qid].update(
                state="FINISHED", rows=summary.result_rows,
                wall_seconds=summary.wall_seconds, retries=summary.retries,
            )
        return {
            "query_id": qid,
            "columns": cols,
            "summary": {
                "rows": summary.result_rows,
                "wall_seconds": summary.wall_seconds,
                "retries": summary.retries,
                "backend": summary.backend,
                "devices": summary.num_devices,
            },
        }

    def queries(self) -> Dict:
        with self._lock:
            return {"queries": list(self._queries.values())[-100:]}

    def status(self) -> Dict:
        import jax

        return {
            "tables": {
                n: {"rows": t.row_count, "columns": list(t.schema)}
                for n, t in self.catalog.tables.items()
            },
            "backend": jax.default_backend(),
            "devices": len(jax.devices()),
            "distributed": self.mesh is not None,
        }


def make_http_server(service: QueryService, port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj):
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/metrics":
                self._send(200, METRICS.dump())
            elif self.path == "/status":
                self._send(200, service.status())
            elif self.path == "/queries":
                self._send(200, service.queries())
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError as e:
                self._send(400, {"error": f"bad json: {e}"})
                return
            try:
                if self.path == "/query":
                    self._send(
                        200,
                        service.execute(req["plan"], req.get("distributed")),
                    )
                elif self.path == "/failpoint":
                    if req.get("action") == "enable":
                        FailPoint.enable(req["name"], req.get("probability"))
                    else:
                        FailPoint.disable(req["name"])
                    self._send(200, {"ok": True})
                else:
                    self._send(404, {"error": f"no route {self.path}"})
            except FailPointError as e:
                self._send(500, {"error": str(e), "kind": "failpoint"})
            except KeyError as e:
                self._send(400, {"error": f"missing/unknown: {e}"})
            except Exception as e:  # surface engine errors as 500s
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def serve_background(service: QueryService, port: int = 0):
    """Start the HTTP server on a daemon thread; returns (server, port)."""
    httpd = make_http_server(service, port)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, httpd.server_address[1]


__all__ = ["QueryService", "make_http_server", "serve_background"]
