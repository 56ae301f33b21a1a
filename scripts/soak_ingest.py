"""End-to-end HTTP ingest soak: HTTP -> decode -> device batch hash ->
WAL-durable store, measured as images/s.

This measures the number VERDICT r2 asked for: not the bare hash kernel
(bench.py's phash imgs/s) but the full serving path with durability —
the reference amortizes one fsync per upsert txn
(src/index/embedded/mod.rs:157-227); here concurrent requests share
fsyncs via the group-commit WAL (ucfp_tpu/index/wal.py:GroupCommitWal).

Usage:
  python scripts/soak_ingest.py [--seconds 10] [--conns 32]
      [--algorithm phash] [--native] [--cpu]

Importable: run_soak(...) returns {"requests", "seconds", "req_per_sec",
"errors"} and is what bench.py calls for ingest_http_imgs_per_sec.
"""

from __future__ import annotations

import argparse
import asyncio
import io
import os
import sys
import tempfile
import time


def _bmp_bytes(w: int = 64, h: int = 64) -> bytes:
    """Small BMP test card (cheap decode: the soak measures the serving
    path, not PNG inflate)."""
    import numpy as np
    from PIL import Image

    x = np.linspace(0, 255, w, dtype=np.uint8)
    y = np.linspace(0, 255, h, dtype=np.uint8)
    img = np.stack(
        [
            np.tile(x, (h, 1)),
            np.tile(y[:, None], (1, w)),
            np.full((h, w), 128, np.uint8),
        ],
        axis=2,
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="BMP")
    return buf.getvalue()


def _batch_body(img: bytes, rids: list[int]) -> bytes:
    import struct

    out = bytearray()
    for rid in rids:
        out += struct.pack("<QI", rid, len(img))
        out += img
    return bytes(out)


def _text_doc_bytes(target_kib: float = 5.6) -> bytes:
    """~5.6 KiB pangram document — the reference's criterion text
    workload (benches/end_to_end.rs:24-42: one pangram paragraph
    repeated to ~5.6 KiB per iteration)."""
    para = ("The quick brown fox jumps over the lazy dog. "
            "Pack my box with five dozen liquor jugs. "
            "How vexingly quick daft zebras jump! ")
    doc = para * (int(target_kib * 1024) // len(para) + 1)
    return doc[: int(target_kib * 1024)].encode()


def _audio_clip_bytes(secs: float = 4.0, sr: int = 8000,
                      encoding: str = "f32") -> bytes:
    """4 s 8 kHz clip — the reference's criterion audio workload
    (benches/end_to_end.rs: 4 s 440 Hz sine), plus a gated band so the
    constellation has real structure. encoding=s16 ships the same
    waveform sampled at 16 bits (half the wire bytes — the realistic
    source depth for PCM audio)."""
    import numpy as np

    t = np.arange(int(secs * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    x = x + 0.25 * np.sin(2 * np.pi * 1200.0 * t) * (
        np.sin(2 * np.pi * 0.7 * t) > 0)
    if encoding == "s16":
        return np.round(x * 32767.0).astype("<i2").tobytes()
    return x.astype("<f4").tobytes()


def _ndjson_template(doc: bytes, rids: list[int]) -> tuple[bytearray, list[int]]:
    """NDJSON batch body for the text batch route with FIXED-WIDTH
    (9-digit) record ids so the per-request rid patch is an in-place
    digit overwrite, like the binary framing's u64 patch."""
    out = bytearray()
    offsets = []
    prefix = b'{"record_id": '
    for rid in rids:
        out += prefix
        offsets.append(len(out))
        out += b"%09d" % rid
        out += b', "text": "'
        out += doc  # pangram ASCII: no JSON escaping needed
        out += b'"}\n'
    return out, offsets


async def _client(host: str, port: int, token: str, body: bytes,
                  algorithm: str, tenant: int, base_rid: int,
                  stop_at: float, counts: dict, batch: int = 1,
                  quiet: bool = False, modality: str = "image",
                  encoding: str = "f32") -> None:
    import struct

    reader, writer = await asyncio.open_connection(host, port)
    rid = base_rid
    # prebuilt request bytes: the client shares the server's single
    # core, and rebuilding a ~1.5 MB batch body per request (bytearray
    # extend of every frame) measured ~8% of the soak budget — only the
    # record ids change between requests, so patch them in place
    template: bytearray | None = None
    rid_offsets: list[int] = []
    if batch > 1:
        if modality == "text":
            template, rid_offsets = _ndjson_template(
                body, list(range(100_000_000, 100_000_000 + batch)))
        else:
            template = bytearray(_batch_body(body, list(range(batch))))
            step = 12 + len(body)
            rid_offsets = [i * step for i in range(batch)]
    try:
        while time.perf_counter() < stop_at:
            rid += batch
            if batch > 1:
                # safe to mutate: the previous request's response was
                # fully read, so these bytes have left the transport
                if modality == "text":
                    # +100M keeps every rid at 9 digits: a leading zero
                    # would be an invalid JSON number
                    for j, off in enumerate(rid_offsets):
                        template[off:off + 9] = (
                            b"%09d" % (100_000_000 + rid - batch + j))
                else:
                    for j, off in enumerate(rid_offsets):
                        struct.pack_into(
                            "<Q", template, off, rid - batch + j)
                payload: bytes | bytearray = template
                q = "&quiet=1" if quiet else ""
                if modality == "text":
                    path = (f"/v1/ingest/text/batch/{tenant}"
                            f"?algorithm={algorithm}{q}")
                    ctype = "application/x-ndjson"
                elif modality == "audio":
                    e = "&encoding=s16" if encoding == "s16" else ""
                    path = (f"/v1/ingest/audio/batch/{tenant}"
                            f"?sample_rate=8000&algorithm={algorithm}{e}{q}")
                    ctype = "application/x-ucfp-audio-batch"
                else:
                    path = (f"/v1/ingest/image/batch/{tenant}"
                            f"?algorithm={algorithm}{q}")
                    ctype = "application/x-ucfp-image-batch"
            else:
                payload = body
                path = f"/v1/ingest/image/{tenant}/{rid}?algorithm={algorithm}"
                ctype = "image/bmp"
            head = (
                f"POST {path} HTTP/1.1\r\nhost: {host}\r\n"
                f"authorization: Bearer {token}\r\n"
                f"content-type: {ctype}\r\n"
                f"content-length: {len(payload)}\r\n\r\n"
            ).encode()
            writer.write(head)
            writer.write(payload)
            await writer.drain()
            # read one response (headers + content-length body)
            hdr = await reader.readuntil(b"\r\n\r\n")
            clen = 0
            for line in hdr.split(b"\r\n"):
                if line.lower().startswith(b"content-length:"):
                    clen = int(line.split(b":", 1)[1])
            if clen:
                await reader.readexactly(clen)
            status = int(hdr.split(b" ", 2)[1])
            if status == 201:
                counts["ok"] += batch
            else:
                counts["err"] += batch
    except (asyncio.IncompleteReadError, ConnectionError):
        counts["drop"] += 1
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass


async def _soak(state, host: str, port: int, token: str, seconds: float,
                conns: int, algorithm: str, native: bool,
                batch: int = 1, quiet: bool = False,
                modality: str = "image", encoding: str = "f32") -> dict:
    from ucfp_tpu.server.app import build_server

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

    return await _drive(host, port, token, seconds, conns, algorithm,
                        batch, quiet, modality, encoding, serve_task)


async def _drive(host, port, token, seconds, conns, algorithm, batch,
                 quiet, modality, encoding, serve_task=None) -> dict:
    """Warmup + measured client window against a listening server (in-
    process task or an external multi-worker stack)."""
    if modality == "text":
        body = _text_doc_bytes()
    elif modality == "audio":
        body = _audio_clip_bytes(encoding=encoding)
    else:
        body = _bmp_bytes()
    # warm the device kernel path until it answers fast twice in a row
    # (first jit compile must not pollute the measured window). The whole
    # warmup is bounded by a wall-clock deadline: through a degraded
    # tunnel window one remote compile was observed taking 480+ s, and
    # with the server's 120 s request timeout this loop could otherwise
    # run 20 x 120 s and starve everything scheduled after the soak
    # (bench.py's per-metric budget only checks BETWEEN metrics). On
    # deadline the measured window still runs — it yields an honest slow
    # number — and warmup_degraded marks the capture as compile-bound.
    warm = dict(ok=0, err=0, drop=0)
    # 600 s: the coalesced [8192, 32, 32] launch shape compiles ~60 s
    # through the tunnel runtime and has been observed taking >300 s in
    # congested windows — a warmup that gives up mid-compile measures a
    # window of pure 408s (one capture: 0 imgs/s, 16384 errors). The
    # budget is only ever spent when a compile is actually cold.
    warm_deadline = time.perf_counter() + float(
        os.environ.get("UCFP_SOAK_WARMUP_S", "600"))
    warm_degraded = False
    # warm with CONCURRENT clients: the cross-request coalescer merges
    # concurrent groups into bigger launches, so serial warmup would
    # leave the coalesced batch shape cold and the first measured-window
    # flush would compile mid-capture (minutes through a congested
    # tunnel). The soak pins UCFP_INGEST_PAD=max (run_soak), so ONE
    # coalesced shape exists and any concurrent round compiles it.
    warm_conns = min(conns, 8)
    for _ in range(20):
        t = time.perf_counter()
        if t >= warm_deadline:
            warm_degraded = True
            break
        try:
            await asyncio.wait_for(
                asyncio.gather(*(
                    _client(host, port, token, body, algorithm, 0,
                            10_000_000 + i * 1_000_000,
                            time.perf_counter() + 0.05, warm, batch, quiet,
                            modality, encoding)
                    for i in range(warm_conns)
                )),
                timeout=max(1.0, warm_deadline - t),
            )
        except asyncio.TimeoutError:
            warm_degraded = True
            break
        if time.perf_counter() - t < 0.2 and warm["ok"] > 2:
            break
    counts = dict(ok=0, err=0, drop=0)
    t0 = time.perf_counter()
    stop_at = t0 + seconds
    await asyncio.gather(*(
        _client(host, port, token, body, algorithm, 0, (i + 1) * 10_000_000,
                stop_at, counts, batch, quiet, modality, encoding)
        for i in range(conns)
    ))
    dt = time.perf_counter() - t0
    if serve_task is not None:
        serve_task.cancel()
        try:
            await serve_task
        except (asyncio.CancelledError, Exception):
            pass
    return {
        "requests": counts["ok"],  # = images ingested (batch-weighted)
        "errors": counts["err"] + counts["drop"],
        "seconds": round(dt, 3),
        "req_per_sec": round(counts["ok"] / dt, 1),
        "batch": batch,
        "warmup_degraded": warm_degraded,
    }


def run_soak(seconds: float = 10.0, conns: int = 32,
             algorithm: str = "phash", native: bool = False,
             data_dir: str | None = None, batch: int = 1,
             quiet: bool = False, modality: str = "image",
             encoding: str = "f32") -> dict:
    """In-process soak; returns the measured dict. modality selects the
    workload + batch route: image (64x64 BMP), text (~5.6 KiB pangram
    NDJSON rows), audio (4 s 8 kHz f32 clips; encoding=s16 ships the
    16-bit wire at half the bytes) — the text/audio bodies mirror the
    reference's criterion workloads so the served numbers compare
    against its per-request model."""
    from ucfp_tpu.index.embedded import EmbeddedBackend
    from ucfp_tpu.server.app import ServerState
    from ucfp_tpu.server.auth import StaticSingleKey
    from ucfp_tpu.server.inputs_cache import InputsCache
    from ucfp_tpu.server.ratelimit import NoopRateLimiter
    from ucfp_tpu.server.usage import NoopUsageSink

    created = data_dir is None
    d = data_dir or tempfile.mkdtemp(prefix="ucfp-soak-")
    token = "soak-token"
    # one compiled coalesced-launch shape for the whole soak (the pow2
    # ladder would compile per flush size — minutes each through the
    # tunnel runtime); saturation flushes fill the cap anyway
    os.environ.setdefault("UCFP_INGEST_PAD", "max")
    state = ServerState(
        index=EmbeddedBackend(d),
        api_keys=StaticSingleKey(token),
        rate_limit=NoopRateLimiter(),
        usage=NoopUsageSink(),
        inputs=InputsCache(),
    )
    try:
        return asyncio.run(
            _soak(state, "127.0.0.1", 0, token, seconds, conns, algorithm,
                  native, batch, quiet, modality, encoding)
        )
    finally:
        state.index.close()
        if created:
            # every bench run invokes 6 soaks; a leaked WAL+store dir
            # per soak accumulates on the long-lived host
            import shutil

            shutil.rmtree(d, ignore_errors=True)


def run_soak_multiworker(workers: int, seconds: float = 10.0,
                         conns: int = 32, algorithm: str = "phash",
                         batch: int = 1, quiet: bool = False,
                         modality: str = "image",
                         encoding: str = "f32",
                         cpu: bool = False) -> dict:
    """Soak against a REAL multi-process stack: one owner (WAL + device)
    + N SO_REUSEPORT workers (server/multiworker.py), spawned as
    subprocesses exactly as `--workers N` deploys them. The bench's
    `ingest_http_imgs_per_sec_w2` key runs this; on a single-core host
    N workers time-slice one core so the number documents correctness
    overhead, not speedup — the per-core ceiling model in BASELINE.md
    is the scaling story."""
    import socket
    import subprocess
    import tempfile as _tf
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    token = "soak-token"
    d = _tf.mkdtemp(prefix="ucfp-mwsoak-")
    env = dict(os.environ, UCFP_WARMUP="1", UCFP_LOG="warn",
               UCFP_DRAIN_SECS="5", UCFP_RATELIMIT_RPS="0")
    if cpu:
        env["UCFP_JAX_PLATFORM"] = "cpu"
    env.setdefault("UCFP_INGEST_PAD", "max")
    proc = subprocess.Popen(
        [sys.executable, "-m", "ucfp_tpu.server",
         "--bind", f"127.0.0.1:{port}", "--token", token,
         "--data-dir", d, "--workers", str(workers)],
        env=env,
    )
    try:
        deadline = time.perf_counter() + 120
        while time.perf_counter() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=3):
                    break
            except OSError:
                time.sleep(0.4)
        else:
            raise RuntimeError("multi-worker stack never became healthy")
        out = asyncio.run(_drive("127.0.0.1", port, token, seconds,
                                 conns, algorithm, batch, quiet,
                                 modality, encoding))
        out["workers"] = workers
        return out
    finally:
        proc.terminate()
        try:
            proc.wait(30)
        except subprocess.TimeoutExpired:
            proc.kill()
        import shutil

        shutil.rmtree(d, ignore_errors=True)


async def _client_only(connect: str, token: str, seconds: float, conns: int,
                       algorithm: str) -> dict:
    host, _, port = connect.rpartition(":")
    body = _bmp_bytes()
    counts = dict(ok=0, err=0, drop=0)
    t0 = time.perf_counter()
    await asyncio.gather(*(
        _client(host, int(port), token, body, algorithm, 0,
                (os.getpid() * 100 + i + 1) * 10_000_000, t0 + seconds, counts)
        for i in range(conns)
    ))
    dt = time.perf_counter() - t0
    return {"requests": counts["ok"], "errors": counts["err"] + counts["drop"],
            "seconds": round(dt, 3), "req_per_sec": round(counts["ok"] / dt, 1)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--conns", type=int, default=32)
    p.add_argument("--algorithm", default="phash")
    p.add_argument("--native", action="store_true")
    p.add_argument("--batch", type=int, default=1,
                   help="images per request via the batch route")
    p.add_argument("--quiet", action="store_true",
                   help="?quiet=1 batch responses (count only, no "
                        "per-record fingerprint hex)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (leave the chip alone)")
    p.add_argument("--connect", default=None,
                   help="client-only mode: hammer an already-running "
                        "server at host:port (token via UCFP_TOKEN)")
    p.add_argument("--modality", default="image",
                   choices=("image", "text", "audio"),
                   help="workload + batch route (text: 5.6 KiB NDJSON "
                        "rows w/ --algorithm minhash|simhash-tf|...; "
                        "audio: 4 s 8 kHz clips w/ wang|panako|haitsma)")
    p.add_argument("--encoding", default="f32", choices=("f32", "s16"),
                   help="audio wire encoding (s16: half the bytes, "
                        "value-identical server decode)")
    p.add_argument("--workers", type=int, default=0,
                   help="soak a real multi-process stack: owner + N "
                        "SO_REUSEPORT workers (server/multiworker.py)")
    args = p.parse_args()
    import json

    if args.workers > 0:
        out = run_soak_multiworker(
            args.workers, args.seconds, args.conns, args.algorithm,
            batch=args.batch, quiet=args.quiet, modality=args.modality,
            encoding=args.encoding, cpu=args.cpu)
        json.dump(out, sys.stdout)
        print()
        return
    if args.connect:
        out = asyncio.run(_client_only(
            args.connect, os.environ.get("UCFP_TOKEN", "soak-token"),
            args.seconds, args.conns, args.algorithm))
        json.dump(out, sys.stdout)
        print()
        return
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = run_soak(args.seconds, args.conns, args.algorithm, args.native,
                   batch=args.batch, quiet=args.quiet,
                   modality=args.modality, encoding=args.encoding)
    json.dump(out, sys.stdout)
    print()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
