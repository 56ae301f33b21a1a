"""Access-log buffering contract: only `request` info lines coalesce
(one write per <=64 lines / 100 ms); lifecycle lines, warn+, and
close() flush immediately and preserve ordering."""

import io

from ucfp_tpu.server.logging import JsonLogger


def _mk(**env):
    stream = io.StringIO()
    lg = JsonLogger(stream=stream, level="info")
    return lg, stream


def test_request_lines_buffer_until_count():
    lg, stream = _mk()
    for i in range(63):
        lg.info("request", seq=i)
    assert stream.getvalue() == ""  # still held
    lg.info("request", seq=63)  # 64th -> one coalesced write
    lines = stream.getvalue().splitlines()
    assert len(lines) == 64
    assert '"seq":0' in lines[0] and '"seq":63' in lines[-1]


def test_lifecycle_line_flushes_and_preserves_order():
    lg, stream = _mk()
    lg.info("request", seq=1)
    assert stream.getvalue() == ""
    lg.info("listening", port=1234)  # non-request info: immediate
    lines = stream.getvalue().splitlines()
    assert len(lines) == 2
    assert '"msg":"request"' in lines[0]
    assert '"msg":"listening"' in lines[1]


def test_warn_flushes_buffered_requests():
    lg, stream = _mk()
    lg.info("request", seq=1)
    lg.warn("slow", ms=900)
    lines = stream.getvalue().splitlines()
    assert len(lines) == 2 and '"level":"warn"' in lines[1]


def test_close_drains_tail():
    lg, stream = _mk()
    lg.info("request", seq=1)
    lg.close()
    assert '"seq":1' in stream.getvalue()


def test_hold_deadline_flushes(monkeypatch):
    import ucfp_tpu.server.logging as L

    lg, stream = _mk()
    t = [100.0]
    monkeypatch.setattr(L.time, "monotonic", lambda: t[0])
    lg.info("request", seq=1)
    assert stream.getvalue() == ""
    t[0] += 0.2  # past the 100 ms hold
    lg.info("request", seq=2)
    assert len(stream.getvalue().splitlines()) == 2


def test_timer_flushes_after_burst_stops():
    # no further log() calls: the deadline timer alone must surface
    # the buffered tail within the hold window
    import time

    lg, stream = _mk()
    lg.info("request", seq=1)
    assert stream.getvalue() == ""
    deadline = time.monotonic() + 2.0
    while time.monotonic() < deadline and stream.getvalue() == "":
        time.sleep(0.01)
    assert '"seq":1' in stream.getvalue()


def test_concurrent_logging_no_loss_or_dup():
    # asyncio loop + warmup thread + to_thread workers all share the
    # global logger; under contention every line must appear exactly once
    import threading

    lg, stream = _mk()
    n_threads, per = 8, 200

    def work(tid):
        for i in range(per):
            lg.info("request", tid=tid, seq=i)

    threads = [threading.Thread(target=work, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lg.close()
    lines = stream.getvalue().splitlines()
    assert len(lines) == n_threads * per
    seen = set()
    for ln in lines:
        import json

        rec = json.loads(ln)
        key = (rec["tid"], rec["seq"])
        assert key not in seen
        seen.add(key)


def test_line_flush_env(monkeypatch):
    monkeypatch.setenv("UCFP_LOG_FLUSH", "line")
    stream = io.StringIO()
    lg = JsonLogger(stream=stream, level="info")
    lg.info("request", seq=1)
    assert '"seq":1' in stream.getvalue()
