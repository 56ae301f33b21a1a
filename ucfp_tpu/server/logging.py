"""Structured JSON request logging (reference: tracing_subscriber JSON
init at src/bin/ucfp.rs:209-215 + TraceLayer per-request spans).

One JSON line per request to stderr; level filtered via UCFP_LOG
(error|warn|info|debug, default info), mirroring the reference's
EnvFilter default `ucfp=info`.
"""

from __future__ import annotations

import json
import os
import sys
import time

_LEVELS = {"error": 40, "warn": 30, "info": 20, "debug": 10}


class JsonLogger:
    def __init__(self, stream=None, level: str | None = None):
        self.stream = stream or sys.stderr
        self.level = _LEVELS.get(
            (level or os.environ.get("UCFP_LOG", "info")).lower(), 20
        )

    def log(self, level: str, msg: str, **fields) -> None:
        if _LEVELS.get(level, 20) < self.level:
            return
        rec = {
            "ts": round(time.time(), 6),
            "level": level,
            "msg": msg,
            **fields,
        }
        # default=repr: a log call in the request path must never raise
        # on a non-JSON-serializable field (bytes, exceptions, Paths)
        self.stream.write(
            json.dumps(rec, separators=(",", ":"), default=repr) + "\n"
        )
        self.stream.flush()

    def info(self, msg: str, **fields) -> None:
        self.log("info", msg, **fields)

    def warn(self, msg: str, **fields) -> None:
        self.log("warn", msg, **fields)

    def error(self, msg: str, **fields) -> None:
        self.log("error", msg, **fields)

    def debug(self, msg: str, **fields) -> None:
        self.log("debug", msg, **fields)


_GLOBAL: JsonLogger | None = None


def logger() -> JsonLogger:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = JsonLogger()
    return _GLOBAL
