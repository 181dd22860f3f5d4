"""Structured engine logging with per-query tracing context.

Role analog: the Poco logger stack + per-MPP-task tracing logger
(``Flash/Mpp/getMPPTaskTracingLog.h``) — here a stdlib logging wrapper
whose records carry the active query id from a contextvar, so service
logs interleave cleanly under concurrency.
"""

from __future__ import annotations

import contextlib
import contextvars
import logging
import os

_query_id: contextvars.ContextVar = contextvars.ContextVar("tfl_query_id", default=None)


class _QueryIdFilter(logging.Filter):
    def filter(self, record):
        qid = _query_id.get()
        record.query = f"q{qid}" if qid is not None else "-"
        return True


_configured = False


def get_logger(name: str = "tiflash_tpu") -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        root = logging.getLogger("tiflash_tpu")
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s [%(levelname)s] [%(query)s] %(name)s: %(message)s"
        ))
        handler.addFilter(_QueryIdFilter())
        root.addHandler(handler)
        level = os.environ.get("TIFLASH_TPU_LOG", "WARNING").upper()
        root.setLevel(getattr(logging, level, logging.WARNING))
        root.propagate = False
        _configured = True
    return logger


@contextlib.contextmanager
def query_context(qid):
    token = _query_id.set(qid)
    try:
        yield
    finally:
        _query_id.reset(token)


__all__ = ["get_logger", "query_context"]
