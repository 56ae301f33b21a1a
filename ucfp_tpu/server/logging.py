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
    # info-line buffering: the per-request write+flush syscall pair
    # measured ~0.2 ms on the query soak (~8% of the 1-core host
    # budget). info lines coalesce into ONE write per <=64 lines /
    # 100 ms window; warn+ and anything after them flush immediately
    # (errors are never delayed), and close()/atexit drains the tail.
    # UCFP_LOG_FLUSH=line restores per-line flushing.
    _MAX_BUF = 64
    _MAX_HOLD_S = 0.1

    def __init__(self, stream=None, level: str | None = None):
        self.stream = stream or sys.stderr
        self.level = _LEVELS.get(
            (level or os.environ.get("UCFP_LOG", "info")).lower(), 20
        )
        self._line_flush = (
            os.environ.get("UCFP_LOG_FLUSH", "").lower() == "line")
        self._buf: list[str] = []
        self._buf_t = 0.0

    def _flush_buf(self) -> None:
        # the atexit drain can run after the interpreter (or a test
        # harness) already closed the stream — dropping the tail lines
        # then is fine, raising at exit is not
        try:
            if self._buf:
                self.stream.write("".join(self._buf))
            self.stream.flush()
        except (ValueError, OSError):
            pass
        finally:
            self._buf.clear()

    def log(self, level: str, msg: str, **fields) -> None:
        lv = _LEVELS.get(level, 20)
        if lv < self.level:
            return
        rec = {
            "ts": round(time.time(), 6),
            "level": level,
            "msg": msg,
            **fields,
        }
        # default=repr: a log call in the request path must never raise
        # on a non-JSON-serializable field (bytes, exceptions, Paths)
        line = json.dumps(rec, separators=(",", ":"), default=repr) + "\n"
        # only the hot per-request access lines buffer: lifecycle lines
        # ("listening", "draining", ...) are watched live by operators
        # and subprocess tests, and warn+ must never be delayed
        if self._line_flush or lv >= 30 or msg != "request":
            self._buf.append(line)
            self._flush_buf()
            return
        now = time.monotonic()
        if not self._buf:
            self._buf_t = now
        self._buf.append(line)
        if (len(self._buf) >= self._MAX_BUF
                or now - self._buf_t >= self._MAX_HOLD_S):
            self._flush_buf()

    def close(self) -> None:
        self._flush_buf()

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
        import atexit

        atexit.register(_GLOBAL.close)
    return _GLOBAL
