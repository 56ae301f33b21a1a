"""End-to-end HTTP query soak: HTTP -> auth -> JSON parse -> (optional
query micro-batching) -> device kNN -> JSON response, measured as
queries/s with client-side latency percentiles.

The BASELINE target is a *served* metric ("/v1/query ANN p50 top-k"),
and the bench's query p50s are device-loop kernel timings while
scripts/knn_serving_overhead.py pins the backend envelope — this soak
closes the last layer: the full HTTP front under concurrency, where the
reference's axum handler path lives (src/server/handlers.rs). With
UCFP_QUERY_BATCH_MS > 0 concurrent plain queries coalesce into ONE
batched device dispatch per (tenant, dim, k) deadline window
(index/embedded.py:_submit_query_batched), so QPS is bounded by
host JSON/handler work + flush cadence rather than per-query kernels.

Every request patches two fixed-width floats in a prebuilt JSON body so
query vectors are NOVEL per request: the tunnel runtime memoizes
repeated identical device inputs to ~0 ms (CLAUDE.md), which would make
a repeated-template soak lie fast.

Usage:
  python scripts/soak_query.py [--seconds 8] [--conns 16] [--n 65536]
      [--d 768] [--k 10] [--qbatch-ms 2] [--quant int8] [--cpu]
      [--native] [--exact]

Importable: run_query_soak(...) returns {"queries", "seconds", "qps",
"errors", "p50_ms", "p90_ms", "p99_ms", "avg_batch", ...} and is what
bench.py calls for query_http_qps.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile
import time


def _query_body(d: int, k: int, tenant: int = 1) -> tuple[bytearray, int]:
    """Prebuilt JSON query body; returns (body, patch_offset) where
    patch_offset points at two consecutive fixed-width float fields
    ("0.12345678,0.12345678") rewritten per request."""
    import numpy as np

    rng = np.random.default_rng(7)
    vec = rng.normal(size=d).astype(np.float32)
    parts = [f"{float(v):.8f}" for v in vec]
    parts[0] = "0.10000000"
    parts[1] = "0.10000000"
    body = (
        '{"tenant_id":%d,"modality":"image","k":%d,"vector":[%s]}'
        % (tenant, k, ",".join(parts))
    ).encode()
    off = body.index(b"[") + 1
    return bytearray(body), off


def _patch(body: bytearray, off: int, seq: int) -> None:
    """Rewrite the two leading vector elements from a counter, keeping
    byte length fixed (values stay in (0.1, 1.0) — 10 chars each)."""
    a = 0.1 + (seq % 8999) / 10000.0
    b = 0.1 + ((seq // 8999) % 8999) / 10000.0
    body[off:off + 21] = f"{a:.8f},{b:.8f}".encode()


async def _client(host: str, port: int, token: str, d: int, k: int,
                  base_seq: int, stop_at: float, counts: dict,
                  lats: list) -> None:
    body, off = _query_body(d, k)
    head_t = (
        "POST /v1/query HTTP/1.1\r\nhost: %s\r\n"
        "authorization: Bearer %s\r\n"
        "content-type: application/json\r\n"
        "content-length: %d\r\n\r\n" % (host, token, len(body))
    ).encode()
    reader, writer = await asyncio.open_connection(host, port)
    seq = base_seq
    try:
        while time.perf_counter() < stop_at:
            seq += 1
            _patch(body, off, seq)
            t0 = time.perf_counter()
            writer.write(head_t)
            writer.write(body)
            await writer.drain()
            hdr = await reader.readuntil(b"\r\n\r\n")
            clen = 0
            for line in hdr.split(b"\r\n"):
                if line.lower().startswith(b"content-length:"):
                    clen = int(line.split(b":", 1)[1])
            if clen:
                await reader.readexactly(clen)
            lats.append(time.perf_counter() - t0)
            status = int(hdr.split(b" ", 2)[1])
            if status == 200:
                counts["ok"] += 1
            else:
                counts["err"] += 1
    except (asyncio.IncompleteReadError, ConnectionError):
        counts["drop"] += 1
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass


async def _preload(index, n: int, d: int, tenant: int = 1) -> None:
    """Bulk-load n random embedding rows through the real bulk upsert
    path (WAL-durable, device cache) in capacity-friendly chunks."""
    import numpy as np

    rng = np.random.default_rng(42)
    chunk = 8192
    for base in range(0, n, chunk):
        m = min(chunk, n - base)
        embs = rng.standard_normal(size=(m, d), dtype=np.float32)
        await index.upsert_embedding_batch(
            tenant, "embedding-local", list(range(base, base + m)), embs,
            fingerprints=[b"\x00" * 8] * m,
        )


async def _soak(state, host: str, port: int, token: str, seconds: float,
                conns: int, n: int, d: int, k: int,
                native: bool) -> dict:
    from ucfp_tpu.server.app import build_server

    t_load0 = time.perf_counter()
    await _preload(state.index, n, d)
    load_s = time.perf_counter() - t_load0

    server = build_server(state, timeout_secs=120.0)
    if native:
        from ucfp_tpu.server.nativehttp import NativeHttpBridge

        bridge = NativeHttpBridge(server, host, port)
        port = bridge.port
        serve_task = asyncio.create_task(bridge.serve_forever())
    else:
        srv = await server.serve(host, port)
        port = srv.sockets[0].getsockname()[1]
        serve_task = asyncio.create_task(srv.serve_forever())
    await asyncio.sleep(0.2)

    # bounded warmup (same contract as soak_ingest: through a degraded
    # tunnel the first compile can take minutes; the measured window
    # still runs and yields an honest slow number, flagged degraded).
    # Runs at FULL concurrency: the micro-batcher pads coalesced
    # batches to powers of two, so each pow-2 Q <= conns is its own
    # compile — warming one connection would leave every larger shape
    # compiling inside the measured window.
    warm = dict(ok=0, err=0, drop=0)
    warm_lats: list = []
    warm_deadline = time.perf_counter() + float(
        os.environ.get("UCFP_SOAK_WARMUP_S", "300"))
    warm_degraded = False
    for _ in range(20):
        t = time.perf_counter()
        if t >= warm_deadline:
            warm_degraded = True
            break
        try:
            await asyncio.wait_for(
                asyncio.gather(*(
                    _client(host, port, token, d, k,
                            (i + 101) * 10_000_000,
                            time.perf_counter() + 0.05, warm, warm_lats)
                    for i in range(conns)
                )),
                timeout=max(1.0, warm_deadline - t),
            )
        except asyncio.TimeoutError:
            warm_degraded = True
            break
        if time.perf_counter() - t < 0.3 and warm["ok"] > 2 * conns:
            break

    flushes0 = getattr(state.index, "_qbatch_flushes", 0)
    items0 = getattr(state.index, "_qbatch_items", 0)
    counts = dict(ok=0, err=0, drop=0)
    lats: list = []
    t0 = time.perf_counter()
    stop_at = t0 + seconds
    await asyncio.gather(*(
        _client(host, port, token, d, k, (i + 1) * 10_000_000,
                stop_at, counts, lats)
        for i in range(conns)
    ))
    dt = time.perf_counter() - t0
    flushes = getattr(state.index, "_qbatch_flushes", 0) - flushes0
    items = getattr(state.index, "_qbatch_items", 0) - items0
    serve_task.cancel()
    try:
        await serve_task
    except (asyncio.CancelledError, Exception):
        pass
    lats.sort()

    def pct(p: float) -> float:
        if not lats:
            return 0.0
        return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 3)

    return {
        "queries": counts["ok"],
        "errors": counts["err"] + counts["drop"],
        "seconds": round(dt, 3),
        "qps": round(counts["ok"] / dt, 1),
        "p50_ms": pct(0.50),
        "p90_ms": pct(0.90),
        "p99_ms": pct(0.99),
        "batch_flushes": flushes,
        "batch_items": items,
        "avg_batch": round(items / flushes, 2) if flushes else 0.0,
        "catalog_n": n,
        "dim": d,
        "k": k,
        "load_s": round(load_s, 2),
        "warmup_degraded": warm_degraded,
    }


def run_query_soak(seconds: float = 8.0, conns: int = 16,
                   n: int = 65_536, d: int = 768, k: int = 10,
                   qbatch_ms: float = 2.0, quant: str | None = None,
                   native: bool = False, exact: bool = False,
                   qbatch_pad: str = "max",
                   data_dir: str | None = None) -> dict:
    """In-process query soak; returns the measured dict.

    exact=True disables micro-batching (qbatch_ms=0) so every request
    rides its own device dispatch — the per-query-dispatch baseline the
    coalesced number should beat under concurrency.

    qbatch_pad="max" (default) pins the flush cap to `conns` and pads
    every coalesced batch to it: exactly ONE compiled batched shape.
    Through the tunnel runtime each distinct shape compiles for
    MINUTES, and the pow2 ladder (1,2,4,8,16) was observed burning a
    25-minute warmup on compiles alone; padding to a full flush costs
    ~nothing because the catalog scan is shared across the batch.
    Pass qbatch_pad="pow2" to exercise the production-default ladder.
    """
    from ucfp_tpu.index.embedded import EmbeddedBackend
    from ucfp_tpu.server.app import ServerState
    from ucfp_tpu.server.auth import StaticSingleKey
    from ucfp_tpu.server.inputs_cache import InputsCache
    from ucfp_tpu.server.ratelimit import NoopRateLimiter
    from ucfp_tpu.server.usage import NoopUsageSink

    created = data_dir is None
    dd = data_dir or tempfile.mkdtemp(prefix="ucfp-qsoak-")
    token = "soak-token"
    saved = {k_: os.environ.get(k_) for k_ in
             ("UCFP_QUERY_BATCH_MS", "UCFP_QBATCH_PAD", "UCFP_QBATCH_MAX")}
    os.environ["UCFP_QUERY_BATCH_MS"] = (
        "0" if exact else str(qbatch_ms))
    os.environ["UCFP_QBATCH_PAD"] = qbatch_pad
    os.environ["UCFP_QBATCH_MAX"] = str(conns if qbatch_pad == "max" else 64)
    try:
        state = ServerState(
            index=EmbeddedBackend(dd, knn_quant=quant),
            api_keys=StaticSingleKey(token),
            rate_limit=NoopRateLimiter(),
            usage=NoopUsageSink(),
            inputs=InputsCache(),
        )
    finally:
        for k_, v in saved.items():
            if v is None:
                os.environ.pop(k_, None)
            else:
                os.environ[k_] = v
    try:
        return asyncio.run(
            _soak(state, "127.0.0.1", 0, token, seconds, conns, n, d, k,
                  native)
        )
    finally:
        state.index.close()
        if created:
            import shutil

            shutil.rmtree(dd, ignore_errors=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--conns", type=int, default=16)
    p.add_argument("--n", type=int, default=65_536)
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--qbatch-ms", type=float, default=2.0)
    p.add_argument("--qbatch-pad", default="max", choices=["max", "pow2"],
                   help="flush padding: max = one compiled shape "
                        "(tunnel-friendly), pow2 = production ladder")
    p.add_argument("--quant", default=None,
                   help="knn quant tier (int8/int4/int2/sketch); default env")
    p.add_argument("--native", action="store_true",
                   help="serve through the C++ epoll front")
    p.add_argument("--exact", action="store_true",
                   help="micro-batching OFF: per-query device dispatch")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the chip alone)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = run_query_soak(args.seconds, args.conns, args.n, args.d, args.k,
                         args.qbatch_ms, args.quant, args.native, args.exact,
                         qbatch_pad=args.qbatch_pad)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
