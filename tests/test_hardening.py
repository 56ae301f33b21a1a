"""Round-2 hardening: embedding validation, WAL replay resilience,
records envelope, per-key quotas, auth IP limits, chunked bodies,
usage metering tags, filter contract."""

import asyncio
import json

import numpy as np
import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.server.usage import LogUsageSink

from test_accounts import cookie_of
from test_accounts import make_app as make_app_accounts
from test_server import TOKEN, call, jbody, make_app, req


def _record(rid=1, **over):
    base = {
        "tenant_id": 1,
        "record_id": rid,
        "modality": "text",
        "algorithm": "raw",
        "fingerprint": [1, 2, 3, 4],
    }
    base.update(over)
    return base


class TestUpsertValidation:
    def test_records_envelope_accepted(self, tmp_path):
        """Reference UpsertRequest is {"records": [...]} (dto.rs:27-34)."""
        app, _ = make_app(tmp_path)
        body = json.dumps({"records": [_record(1), _record(2)]}).encode()
        resp = call(app, "PUT", "/v1/records", body)
        assert resp.status == 200
        assert jbody(resp)["upserted"] == 2

    def test_bad_records_envelope(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "PUT", "/v1/records",
                    json.dumps({"records": "nope"}).encode())
        assert resp.status == 400

    @pytest.mark.parametrize(
        "emb",
        [["x"], [1.0, "y"], [], "str", [float("nan")], [float("inf")], [True]],
    )
    def test_bad_embedding_rejected_before_wal(self, tmp_path, emb):
        app, state = make_app(tmp_path)
        resp = call(
            app, "PUT", "/v1/records",
            json.dumps([_record(embedding=emb)]).encode(),
        )
        assert resp.status == 400
        # nothing durably logged: a fresh open must see zero records
        state.index.close()
        reopened = EmbeddedBackend(str(tmp_path / "db"))
        with pytest.raises(Exception):
            reopened.get_record(1, 1)
        reopened.close()

    def test_good_embedding_roundtrip(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(
            app, "PUT", "/v1/records",
            json.dumps([_record(embedding=[0.5, 1, -2.25])]).encode(),
        )
        assert resp.status == 200


class TestReplayResilience:
    def test_poisoned_wal_event_skipped(self, tmp_path):
        """A malformed event in the log must not brick open()."""
        d = str(tmp_path / "db")
        be = EmbeddedBackend(d, wal_engine="json")
        from ucfp_tpu.core import Modality, Record

        asyncio.run(be.upsert([Record(
            tenant_id=1, record_id=1, modality=Modality.TEXT,
            algorithm="raw", fingerprint=b"\x01\x02",
        )]))
        be.close()
        # hand-poison the log: non-numeric embedding (the class of row a
        # pre-validation build could have persisted)
        import os

        with open(os.path.join(d, "ucfp.wal"), "a") as f:
            f.write(json.dumps({
                "op": "upsert", "tenant_id": 1, "record_id": 2,
                "modality": "text", "algorithm": "raw",
                "fingerprint": "0102", "metadata": "",
                "embedding": ["x"],
            }) + "\n")
        reopened = EmbeddedBackend(d)  # must not raise
        assert reopened.get_record(1, 1)["algorithm"] == "raw"
        with pytest.raises(Exception):
            reopened.get_record(1, 2)
        reopened.close()


class TestInfoContract:
    def test_crate_version_field(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "GET", "/v1/info", token=None))
        assert body["crate_version"] == body["version"]


class TestQueryFilter:
    def test_filter_is_unsupported_not_ignored(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = json.dumps({
            "tenant_id": 1, "modality": "text", "k": 3,
            "vector": [1.0, 0.0], "filter": {"field": "x"},
        }).encode()
        resp = call(app, "POST", "/v1/query", body)
        assert resp.status == 501
        assert jbody(resp)["error"] == "unsupported"


def make_app_keys(tmp_path):
    """Accounts app whose issued keys also authenticate (composite
    lookup, as state_from_env wires it)."""
    from ucfp_tpu.server.accounts import AccountStore
    from ucfp_tpu.server.app import ServerState, build_server
    from ucfp_tpu.server.auth import StaticSingleKey
    from ucfp_tpu.server.inputs_cache import InputsCache
    from ucfp_tpu.server.keystore import CompositeKeyLookup, PersistentKeyStore
    from ucfp_tpu.server.ratelimit import NoopRateLimiter
    from ucfp_tpu.server.usage import NoopUsageSink

    ks = PersistentKeyStore(str(tmp_path / "keys.json"))
    state = ServerState(
        index=EmbeddedBackend(str(tmp_path / "db")),
        api_keys=CompositeKeyLookup(StaticSingleKey(TOKEN), ks),
        rate_limit=NoopRateLimiter(),
        usage=NoopUsageSink(),
        inputs=InputsCache(),
        keystore=ks,
        accounts=AccountStore(str(tmp_path / "accounts.json")),
    )
    return build_server(state, timeout_secs=120.0), state


class TestPerKeyQuota:
    def test_minute_budget_429(self, tmp_path):
        app, state = make_app_keys(tmp_path)
        issued = jbody(call(
            app, "POST", "/v1/admin/keys",
            json.dumps({"tenant_id": 5, "rate_limit_per_min": 2}).encode(),
        ))
        assert issued["rate_limit_per_min"] == 2
        tok = issued["token"]
        q = json.dumps({"tenant_id": 5, "modality": "text", "k": 1,
                        "vector": [1.0]}).encode()
        assert call(app, "POST", "/v1/query", q, token=tok).status == 200
        assert call(app, "POST", "/v1/query", q, token=tok).status == 200
        third = call(app, "POST", "/v1/query", q, token=tok)
        assert third.status == 429
        assert "retry-after" in third.headers
        # the service bearer (no per-key budget) is unaffected
        assert call(app, "POST", "/v1/query", json.dumps(
            {"tenant_id": 1, "modality": "text", "k": 1, "vector": [1.0]}
        ).encode()).status == 200

    def test_daily_quota_429(self, tmp_path):
        app, state = make_app_keys(tmp_path)
        issued = jbody(call(
            app, "POST", "/v1/admin/keys",
            json.dumps({"tenant_id": 5, "rate_limit_per_min": 0,
                        "daily_quota": 1}).encode(),
        ))
        tok = issued["token"]
        q = json.dumps({"tenant_id": 5, "modality": "text", "k": 1,
                        "vector": [1.0]}).encode()
        assert call(app, "POST", "/v1/query", q, token=tok).status == 200
        assert call(app, "POST", "/v1/query", q, token=tok).status == 429

    def test_bad_quota_body_400(self, tmp_path):
        app, _ = make_app_accounts(tmp_path)
        resp = call(app, "POST", "/v1/admin/keys",
                    json.dumps({"tenant_id": 5, "daily_quota": -1}).encode())
        assert resp.status == 400


class TestAuthIpLimit:
    def test_signup_rate_limited_per_ip(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_AUTH_IP_RPM", "3")
        app, _ = make_app_accounts(tmp_path)
        for i in range(3):
            r = call(app, "POST", "/v1/auth/signup",
                     json.dumps({"email": f"u{i}@x.co",
                                 "password": "password!"}).encode(),
                     token=None)
            assert r.status == 201
        r = call(app, "POST", "/v1/auth/signup",
                 json.dumps({"email": "u9@x.co",
                             "password": "password!"}).encode(), token=None)
        assert r.status == 429
        assert "retry-after" in r.headers


class TestUsageTags:
    def test_modality_and_algorithm_populated(self, tmp_path):
        log = tmp_path / "usage.ndjson"
        app, _ = make_app(tmp_path, usage=LogUsageSink(str(log)))

        async def go():
            r1, _ = await app.handle_request(req(
                "POST", "/v1/ingest/text/1/1",
                b"the quick brown fox jumps over the lazy dog",
                query="algorithm=minhash",
            ))
            r2, _ = await app.handle_request(req(
                "POST", "/v1/query",
                json.dumps({"tenant_id": 1, "modality": "text", "k": 1,
                            "vector": [1.0]}).encode(),
            ))
            await asyncio.sleep(0.2)  # fire-and-forget usage tasks drain
            return r1, r2

        r1, r2 = asyncio.run(go())
        assert r1.status == 201 and r2.status == 200
        events = [json.loads(l) for l in log.read_text().splitlines()]
        ingest = [e for e in events if e["op"] == "ingest"]
        query = [e for e in events if e["op"] == "query"]
        assert ingest and ingest[0]["modality"] == "text"
        assert ingest[0]["algorithm"].startswith("minhash")
        assert query and query[0]["modality"] == "text"


class TestAsyncioFrontFraming:
    """Raw-socket tests against the asyncio HTTP front."""

    def _roundtrip(self, tmp_path, payload: bytes, nresp: int = 1):
        app, _ = make_app(tmp_path)

        async def go():
            srv = await app.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            try:
                reader, writer = await asyncio.open_connection("127.0.0.1", port)
                writer.write(payload)
                await writer.drain()
                data = b""
                # read until we have nresp complete responses or EOF
                while data.count(b"HTTP/1.1 ") < nresp:
                    chunk = await asyncio.wait_for(reader.read(65536), timeout=20)
                    if not chunk:
                        break
                    data += chunk
                # small grace read for trailing bytes
                try:
                    data += await asyncio.wait_for(reader.read(65536), timeout=0.3)
                except asyncio.TimeoutError:
                    pass
                writer.close()
                return data
            finally:
                srv.close()
                await srv.wait_closed()

        return asyncio.run(go())

    def test_chunked_body_decoded(self, tmp_path):
        body = b"the quick brown fox jumps over the lazy dog"
        chunked = b"%x\r\n%s\r\n0\r\n\r\n" % (len(body), body)
        payload = (
            b"POST /v1/ingest/text/1/7?algorithm=minhash HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"201 Created" in data
        assert b'"fingerprint_hex"' in data

    def test_chunked_smuggling_fails_closed(self, tmp_path):
        """A chunked body containing a pipelined-looking request must be
        treated as BODY, not as a second request."""
        inner = (b"GET /healthz HTTP/1.1\r\nHost: x\r\n\r\n")
        chunked = b"%x\r\n%s\r\n0\r\n\r\n" % (len(inner), inner)
        payload = (
            b"POST /v1/ingest/text/1/8?algorithm=minhash HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Content-Length: 0\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
        )
        data = self._roundtrip(tmp_path, payload, nresp=1)
        # exactly ONE response — the smuggled GET never executes
        assert data.count(b"HTTP/1.1 ") == 1
        assert b"201 Created" in data

    def test_bad_content_length_400(self, tmp_path):
        payload = (
            b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: abc\r\n\r\n"
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"400 Bad Request" in data
        assert b"bad_content_length" in data

    def test_negative_content_length_400(self, tmp_path):
        payload = (
            b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Content-Length: -5\r\n\r\n"
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"400 Bad Request" in data

    def test_malformed_chunk_400(self, tmp_path):
        payload = (
            b"POST /v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Transfer-Encoding: chunked\r\n\r\nzz\r\n"
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"400 Bad Request" in data

    def test_streaming_route_bad_content_length_400(self, tmp_path):
        """The streaming branch shares ONE content-length parser with the
        buffered branch — malformed values get the same 400 there."""
        payload = (
            b"POST /v1/ingest/audio/1/9/stream?sample_rate=8000 HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Content-Length: 12abc\r\n\r\n"
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"400 Bad Request" in data
        assert b"bad_content_length" in data

    def test_streaming_early_response_stalled_body_408(self, tmp_path,
                                                       monkeypatch):
        """When the response is decided BEFORE the body is consumed (401
        from auth middleware on a streaming route), draining the unsent
        remainder must run under the read timeout: a client that stalls
        mid-body gets a 408 and the socket back, instead of pinning the
        connection + task on an unbounded read forever."""
        monkeypatch.setenv("UCFP_READ_TIMEOUT_SECS", "0.5")
        payload = (
            b"POST /v1/ingest/audio/1/9/stream?sample_rate=8000 HTTP/1.1\r\n"
            b"Host: x\r\n"  # no Authorization: middleware answers early
            b"Content-Length: 1000000\r\n\r\n"
            b"partial-body-then-silence"
        )
        data = self._roundtrip(tmp_path, payload)
        assert b"408" in data and b"timeout" in data


class TestDemoFingerprint:
    """Anonymous compute-only demo path (reference /api/fingerprint
    anonymous mode: 60/min/IP)."""

    def test_text_demo_no_auth_no_store(self, tmp_path):
        app, state = make_app(tmp_path)
        r = call(app, "POST", "/v1/demo/fingerprint",
                 b"the quick brown fox jumps over the lazy dog", token=None)
        assert r.status == 200
        b = jbody(r)
        assert b["stored"] is False
        assert b["algorithm"].startswith("minhash")
        assert b["fingerprint_bytes"] == 1032
        assert state.index._records == {}  # nothing persisted

    def test_demo_image_multihash(self, tmp_path):
        from test_imagehash import synthetic_png

        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/demo/fingerprint", synthetic_png(64, 64),
                 token=None, headers={"content-type": "image/png"})
        assert r.status == 200
        assert jbody(r)["fingerprint_bytes"] == 536

    def test_demo_ip_limit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_DEMO_RPM", "2")
        app, _ = make_app(tmp_path)
        for _ in range(2):
            assert call(app, "POST", "/v1/demo/fingerprint", b"hello world",
                        token=None).status == 200
        r = call(app, "POST", "/v1/demo/fingerprint", b"hello world",
                 token=None)
        assert r.status == 429 and "retry-after" in r.headers

    def test_demo_disabled(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_DEMO_RPM", "0")
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/demo/fingerprint", b"x", token=None)
        assert r.status == 404


class TestApproximateMarker:
    def test_fused_fingerprint_path_is_marked(self, tmp_path, monkeypatch):
        """When the fused partial-reduce serves a query, the response
        carries approximate: true instead of silently changing semantics."""
        monkeypatch.setenv("UCFP_SHARD", "off")
        from ucfp_tpu.ops import pallas_scan

        # shrink the tile so the 1024-row starting capacity is aligned
        monkeypatch.setattr(pallas_scan, "ROWS_PER_TILE", 8)
        app, state = make_app(tmp_path)
        recs = [_record(i, fingerprint=[i % 256] * 8, algorithm="raw",
                        modality="image") for i in range(1, 6)]
        assert call(app, "PUT", "/v1/records",
                    json.dumps({"records": recs}).encode()).status == 200
        q = json.dumps({
            "tenant_id": 1, "modality": "image", "k": 1,
            "algorithm": "raw",
            "fingerprint_hex": ("03" * 8),
        }).encode()
        resp = jbody(call(app, "POST", "/v1/query", q))
        assert resp.get("approximate") is True
        assert resp["hits"][0]["record_id"] == 3  # top-1 stays exact

    def test_exact_paths_unmarked(self, tmp_path):
        app, _ = make_app(tmp_path)
        call(app, "PUT", "/v1/records", json.dumps(
            {"records": [_record(1, embedding=[1.0, 0.0])]}).encode())
        resp = jbody(call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 1, "modality": "text", "k": 1, "vector": [1.0, 0.0],
        }).encode()))
        assert "approximate" not in resp


class TestTrueStreaming:
    """Stream endpoints consume the socket incrementally (BodyStream):
    O(segment) memory, chunked or content-length framed, keep-alive
    survives."""

    def _stream(self, tmp_path, payload: bytes, nresp=1):
        # reuse the socket runner from the framing tests
        return TestAsyncioFrontFraming()._roundtrip(tmp_path, payload, nresp)

    def test_chunked_audio_stream_segments(self, tmp_path):
        import numpy as np

        sr = 8000
        t = np.arange(sr * 4) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.9 * t) > 0)
             ).astype("<f4").tobytes()
        # feed in 16 KiB chunks with deliberately unaligned sizes
        chunks = []
        pos = 0
        while pos < len(x):
            step = 16384 + 3 if pos else 16381  # exercise the f32 tail carry
            chunks.append(x[pos:pos + step])
            pos += step
        chunked = b"".join(b"%x\r\n%s\r\n" % (len(c), c) for c in chunks if c)
        chunked += b"0\r\n\r\n"
        payload = (
            b"POST /v1/ingest/audio/1/100/stream?sample_rate=8000&segment_secs=1 HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
            # pipelined request proves framing survived the stream
            + b"GET /healthz HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n"
        )
        data = self._stream(tmp_path, payload, nresp=2)
        assert b"201 Created" in data
        assert b'"segments":' in data
        body = json.loads(data.split(b"\r\n\r\n")[1].split(b"HTTP/1.1")[0])
        assert body["segments"] >= 2  # 4 s at 1 s segments (+halo)
        assert b'"status":"ok"' in data  # the pipelined healthz answered

    def test_stream_exceeds_normal_body_limit(self, tmp_path):
        """Streaming routes are exempt from the buffered body limit —
        unbounded length with bounded memory is their purpose."""
        import numpy as np

        from test_server import make_app as _make

        app, _ = _make(tmp_path)
        app.body_limit = 64 * 1024  # tiny buffered limit
        sr = 8000
        x = np.zeros(sr * 3, "<f4")
        x[::9] = 0.7
        raw = x.tobytes()  # 96 KB > 64 KB limit
        payload = (
            b"POST /v1/ingest/audio/1/200/stream?sample_rate=8000&segment_secs=1 HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Content-Length: " + str(len(raw)).encode() + b"\r\n\r\n" + raw
        )

        async def go():
            srv = await app.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            try:
                reader, writer = await asyncio.open_connection("127.0.0.1", port)
                writer.write(payload)
                await writer.drain()
                data = await asyncio.wait_for(reader.read(65536), timeout=60)
                writer.close()
                return data
            finally:
                srv.close()
                await srv.wait_closed()

        data = asyncio.run(go())
        assert b"201 Created" in data

    def test_chunked_text_stream(self, tmp_path):
        lines = b"".join(
            json.dumps({"chunk": f"the quick brown fox part {i} "}).encode() + b"\n"
            for i in range(8)
        )
        half = len(lines) // 2
        chunked = (b"%x\r\n%s\r\n" % (half, lines[:half])
                   + b"%x\r\n%s\r\n" % (len(lines) - half, lines[half:])
                   + b"0\r\n\r\n")
        payload = (
            b"POST /v1/ingest/text/1/300/stream?algorithm=minhash HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
        )
        data = self._stream(tmp_path, payload)
        assert b"201 Created" in data
        assert b'"fingerprint_bytes":1032' in data


class TestMultipartAudioStream:
    """Reference wire shape: the audio stream route accepts
    multipart/form-data, each part a chunk of f32 PCM
    (handlers.rs:963-1011)."""

    def _multipart(self, parts, boundary=b"XBOUND"):
        out = b""
        for p in parts:
            out += (b"--" + boundary + b"\r\n"
                    + b'Content-Disposition: form-data; name="chunk"\r\n'
                    + b"Content-Type: application/octet-stream\r\n\r\n"
                    + p + b"\r\n")
        return out + b"--" + boundary + b"--\r\n"

    def test_multipart_parts_concatenate(self, tmp_path):
        import numpy as np

        app, state = make_app(tmp_path)
        sr = 8000
        t = np.arange(sr * 3) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("<f4").tobytes()
        third = len(x) // 3 // 4 * 4
        body = self._multipart([x[:third], x[third:2 * third], x[2 * third:]])
        r = call(
            app, "POST", "/v1/ingest/audio/1/700/stream", body,
            query="sample_rate=8000&segment_secs=1",
            headers={"content-type": "multipart/form-data; boundary=XBOUND"},
        )
        assert r.status == 201
        assert jbody(r)["segments"] >= 1
        # identical to the raw-body ingest of the same PCM
        r2 = call(app, "POST", "/v1/ingest/audio/1/800/stream", x,
                  query="sample_rate=8000&segment_secs=1")
        b1 = [m["fingerprint_bytes"] for m in jbody(r)["records"]]
        b2 = [m["fingerprint_bytes"] for m in jbody(r2)["records"]]
        assert b1 == b2

    def test_multipart_chunked_socket(self, tmp_path):
        """Multipart over chunked transfer with the delimiter split
        across chunk boundaries."""
        import numpy as np

        sr = 8000
        t = np.arange(sr * 2) / sr
        x = (0.4 * np.sin(2 * np.pi * 700 * t)).astype("<f4").tobytes()
        body = self._multipart([x])
        # split so the boundary bytes straddle two transfer chunks
        cut = body.find(b"--XBOUND--") + 4
        chunks = [body[:1000], body[1000:cut], body[cut:]]
        chunked = b"".join(b"%x\r\n%s\r\n" % (len(c), c) for c in chunks if c)
        chunked += b"0\r\n\r\n"
        payload = (
            b"POST /v1/ingest/audio/1/900/stream?sample_rate=8000&segment_secs=1 HTTP/1.1\r\n"
            b"Host: x\r\nAuthorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Content-Type: multipart/form-data; boundary=XBOUND\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunked
        )
        data = TestAsyncioFrontFraming()._roundtrip(tmp_path, payload)
        assert b"201 Created" in data
        assert b'"segments":' in data

    def test_multipart_missing_boundary_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/ingest/audio/1/1/stream", b"\x00" * 8,
                 query="sample_rate=8000",
                 headers={"content-type": "multipart/form-data"})
        assert r.status == 400


class TestAlgorithmGates:
    """UCFP_DISABLED_ALGORITHMS: the reference's per-algorithm feature
    gates answer 501 naming the missing flag (handlers.rs:259-263)."""

    def test_disabled_algorithm_501(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_DISABLED_ALGORITHMS", "tlsh, panako")
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/ingest/text/1/1",
                 b"a long enough body for tlsh fingerprinting " * 3,
                 query="algorithm=tlsh")
        assert r.status == 501
        assert "UCFP_DISABLED_ALGORITHMS" in jbody(r)["message"]
        # other algorithms unaffected
        ok = call(app, "POST", "/v1/ingest/text/1/2",
                  b"the quick brown fox", query="algorithm=minhash")
        assert ok.status == 201
        aud = call(app, "POST", "/v1/ingest/audio/1/3", b"\x00" * 32000,
                   query="sample_rate=8000&algorithm=panako")
        assert aud.status == 501


class TestReferenceTunableAliases:
    """Reference AudioParams prefixes per-algorithm tunables
    (panako_*/haitsma_*/watermark_*, dto.rs:256-332); both spellings
    work, prefixed wins."""

    def test_haitsma_prefixed_alias(self, tmp_path):
        import numpy as np

        app, _ = make_app(tmp_path)
        sr = 8000
        t = np.arange(sr * 2) / sr
        x = (0.5 * np.sin(2 * np.pi * 700 * t)).astype("<f4").tobytes()
        a = jbody(call(app, "POST", "/v1/ingest/audio/1/1", x,
                       query="sample_rate=8000&algorithm=haitsma&haitsma_fmin=400"))
        b = jbody(call(app, "POST", "/v1/ingest/audio/1/2", x,
                       query="sample_rate=8000&algorithm=haitsma&fmin=400"))
        c = jbody(call(app, "POST", "/v1/ingest/audio/1/3", x,
                       query="sample_rate=8000&algorithm=haitsma"))
        assert a["config_hash"] == b["config_hash"]
        assert a["config_hash"] != c["config_hash"]
        assert a["fingerprint_hex"] == b["fingerprint_hex"]

    def test_prefixed_out_of_range_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/ingest/audio/1/4", b"\x00" * 64,
                 query="sample_rate=8000&algorithm=panako&panako_fan_out=999")
        assert r.status == 400
        assert "panako_fan_out" in jbody(r)["message"]


class TestCanonAliases:
    def test_nfd_nfkd_normalization(self, tmp_path):
        app, _ = make_app(tmp_path)
        # é composed vs decomposed: NFD splits, so shingles differ from NFC
        body = "café latte again and again".encode()
        a = jbody(call(app, "POST", "/v1/ingest/text/1/1", body,
                       query="algorithm=minhash&canon_normalization=nfd"))
        b = jbody(call(app, "POST", "/v1/ingest/text/1/2", body,
                       query="algorithm=minhash&canon_normalization=nfc"))
        assert a["config_hash"] != b["config_hash"]
        bad = call(app, "POST", "/v1/ingest/text/1/3", body,
                   query="algorithm=minhash&canon_normalization=bogus")
        assert bad.status == 400

    def test_canon_apply_confusable_alias(self, tmp_path):
        app, _ = make_app(tmp_path)
        # Cyrillic 'а' confusable-folds to Latin 'a' under the skeleton
        body = "pаyload attack text here".encode()
        a = jbody(call(app, "POST", "/v1/ingest/text/1/4", body,
                       query="algorithm=minhash&canon_apply_confusable=1"))
        b = jbody(call(app, "POST", "/v1/ingest/text/1/5", body,
                       query="algorithm=minhash&canon_confusable=1"))
        plain = jbody(call(app, "POST", "/v1/ingest/text/1/6", body,
                           query="algorithm=minhash"))
        assert a["fingerprint_hex"] == b["fingerprint_hex"]
        assert a["fingerprint_hex"] != plain["fingerprint_hex"]


class TestRouteParity:
    def test_dedicated_watermark_route(self, tmp_path):
        import numpy as np

        app, _ = make_app(tmp_path)
        sr = 8000
        x = np.zeros(sr, "<f4")
        r = call(app, "POST", "/v1/ingest/audio/1/1/watermark", x.tobytes(),
                 query="sample_rate=8000&watermark_threshold=0.9",
                 headers={"x-watermark-key": "tenant-1-secret"})
        assert r.status == 200
        b = jbody(r)
        assert set(b) >= {"detected", "payload", "confidence"}
        assert b["detected"] is False  # silence carries no watermark
        # the key is REQUIRED (round-3 keyed watermark)
        r2 = call(app, "POST", "/v1/ingest/audio/1/1/watermark", x.tobytes(),
                  query="sample_rate=8000")
        assert r2.status == 400

    def test_inspect_text_algorithm_selector(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = b"the quick brown fox jumps over the lazy dog " * 3
        sim = jbody(call(app, "POST", "/v1/pipeline/inspect/text", body,
                         query="algorithm=simhash-tf&tenant_id=1"))
        assert len(sim["simhash_hex"]) == 16
        tl = jbody(call(app, "POST", "/v1/pipeline/inspect/text", body,
                        query="algorithm=tlsh&tenant_id=1"))
        assert len(tl["tlsh"]) == 70
        # unknown algorithm falls back to the minhash stages (reference)
        mh = jbody(call(app, "POST", "/v1/pipeline/inspect/text", body,
                        query="algorithm=bogus&tenant_id=1"))
        assert "signature_u64" in mh and "simhash_hex" not in mh


class TestReferenceRouteShapes:
    def test_image_semantic_route(self, tmp_path):
        from test_imagehash import synthetic_png

        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/ingest/image/1/1/semantic",
                 synthetic_png(64, 64), query="return_embedding=1")
        assert r.status == 201
        b = jbody(r)
        assert b["has_embedding"] and "embedding" in b["algorithm"]

    def test_text_preprocess_route(self, tmp_path):
        app, _ = make_app(tmp_path)
        html = b"<html><body><h1>Title</h1><p>the quick brown fox</p></body></html>"
        r = call(app, "POST", "/v1/ingest/text/1/2/preprocess/html", html)
        assert r.status == 201
        bad = call(app, "POST", "/v1/ingest/text/1/3/preprocess/docx", b"x")
        assert bad.status == 400

    def test_inputs_post_without_tenant(self, tmp_path):
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/inputs", b"cached bytes")
        assert r.status == 201
        iid = jbody(r)["input_id"]
        # the service bearer is tenant 0, so the cached entry lives there
        ok = call(app, "POST", "/v1/ingest/text/0/5",
                  b"", query=f"algorithm=minhash&input_id={iid}")
        assert ok.status == 201

    def test_inspect_tenant_in_path(self, tmp_path):
        app, _ = make_app(tmp_path)
        r = call(app, "POST", "/v1/pipeline/inspect/text/3",
                 b"the quick brown fox jumps over the lazy dog")
        assert r.status == 200
        assert "tokens" in jbody(r)


class TestLibraryPathValidation:
    def test_direct_upsert_validates_before_wal(self, tmp_path):
        """The WAL-first guarantee holds for LIBRARY callers too: a bad
        record mid-batch must reach neither the log nor live state."""
        import pytest as _pytest

        from ucfp_tpu.core import Modality, Record

        be = EmbeddedBackend(str(tmp_path / "db"))
        good = Record(1, 1, Modality.TEXT, "raw", b"\x01",
                      embedding=[1.0, 0.0])
        bad = Record(1, 2, Modality.TEXT, "raw", b"\x02",
                     embedding=[float("nan"), 0.0])
        good2 = Record(1, 3, Modality.TEXT, "raw", b"\x03")
        with _pytest.raises(ValueError):
            asyncio.run(be.upsert([good, bad, good2]))
        # nothing from the batch is live
        for rid in (1, 2, 3):
            with _pytest.raises(Exception):
                be.get_record(1, rid)
        be.close()
        # ...and nothing survived in the log
        be2 = EmbeddedBackend(str(tmp_path / "db"))
        for rid in (1, 2, 3):
            with _pytest.raises(Exception):
                be2.get_record(1, rid)
        be2.close()


class TestReadTimeouts:
    """Slow-client protection: header/body trickling must not pin a
    connection forever — UCFP_READ_TIMEOUT_SECS bounds the read phase."""

    def _slow_client(self, tmp_path, payload, expect_close_secs,
                     monkeypatch):
        monkeypatch.setenv("UCFP_READ_TIMEOUT_SECS", "1")
        app, _ = make_app(tmp_path)

        async def go():
            srv = await app.serve("127.0.0.1", 0)
            port = srv.sockets[0].getsockname()[1]
            try:
                reader, writer = await asyncio.open_connection(
                    "127.0.0.1", port)
                writer.write(payload)
                await writer.drain()
                # server must give up within the timeout + slack
                data = await asyncio.wait_for(
                    reader.read(65536), timeout=expect_close_secs)
                writer.close()
                return data
            finally:
                srv.close()
                await srv.wait_closed()

        return asyncio.run(go())

    def test_partial_headers_dropped(self, tmp_path, monkeypatch):
        # header fragment, then silence: connection closes (no response)
        data = self._slow_client(
            tmp_path, b"POST /v1/query HTTP/1.1\r\nHost:", 5.0, monkeypatch)
        assert data == b""

    def test_body_trickle_gets_408(self, tmp_path, monkeypatch):
        # full headers claiming a body that never arrives -> 408
        payload = (
            b"POST /v1/ingest/text/0/1 HTTP/1.1\r\nHost: x\r\n"
            b"Authorization: Bearer " + TOKEN.encode() + b"\r\n"
            b"Content-Length: 1000\r\n\r\nonly-a-few-bytes"
        )
        data = self._slow_client(tmp_path, payload, 5.0, monkeypatch)
        assert b"408" in data and b"timeout" in data


class TestJsonBodyEncoding:
    def test_invalid_utf8_json_is_400(self, tmp_path):
        # json.loads(bytes) raises UnicodeDecodeError (not JSONDecodeError)
        # for invalid UTF-8 — must map to 400, never 500
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", b'\xff{"k":1}')
        assert resp.status == 400
        assert jbody(resp)["error"] == "bad_json"


class TestMetricsHardening:
    def test_unknown_methods_collapse_to_other(self, tmp_path):
        app, _ = make_app(tmp_path)
        for m in ('M1', 'M2', 'GET",path="/forged'):
            call(app, m, "/healthz", token=None)
        resp = call(app, "GET", "/metrics", token=None)
        text = resp.body.decode()
        assert 'method="OTHER"' in text
        assert "M1" not in text and "forged" not in text


class TestWalEngineSniff:
    def test_auto_sniffs_existing_json_log(self, tmp_path):
        from ucfp_tpu.index.wal import JsonWal, open_wal

        path = str(tmp_path / "w.wal")
        w = JsonWal(path)
        w.append_events([{"op": "upsert", "tenant_id": 1, "record_id": 2,
                          "modality": "text", "algorithm": "a",
                          "fingerprint": b"xy", "metadata": b"",
                          "embedding": None, "model_id": None, "text": None,
                          "format_version": 1, "config_hash": 0}])
        w.close()
        # auto must NOT hand a JSON log to the native engine (silent
        # zero-event replay + mixed formats)
        reopened = open_wal(path, "auto")
        assert isinstance(reopened, JsonWal)
        events = list(reopened.replay())
        assert len(events) == 1 and events[0]["fingerprint"] == b"xy"
        reopened.close()

    def test_auto_sniffs_existing_native_log(self, tmp_path):
        from ucfp_tpu.native import load_walstore
        from ucfp_tpu.index.wal import NativeWal, open_wal

        if load_walstore() is None:
            pytest.skip("no toolchain")
        path = str(tmp_path / "w.wal")
        w = open_wal(path, "native")
        w.append_events([{"op": "delete", "tenant_id": 3,
                          "record_ids": [7, 8]}])
        w.close()
        reopened = open_wal(path, "auto")
        assert isinstance(reopened, NativeWal)
        events = list(reopened.replay())
        assert events == [{"op": "delete", "tenant_id": 3,
                           "record_ids": [7, 8]}]
        reopened.close()


class TestNativeWalCompactionSafety:
    def test_failed_replace_reattaches_original(self, tmp_path,
                                                monkeypatch):
        from ucfp_tpu.native import load_walstore
        from ucfp_tpu.index.wal import NativeWal

        if load_walstore() is None:
            pytest.skip("no toolchain")
        path = str(tmp_path / "w.wal")
        w = NativeWal(path, load_walstore())
        ev = {"op": "delete", "tenant_id": 1, "record_ids": [1]}
        w.append_events([ev])
        # force the replace step to fail
        real_replace = w._lib.ucfp_wal_replace
        monkeypatch.setattr(
            w._lib, "ucfp_wal_replace", lambda h, p: -4, raising=False)
        with pytest.raises(OSError):
            w.rewrite([ev])
        monkeypatch.setattr(
            w._lib, "ucfp_wal_replace", real_replace, raising=False)
        # the object must still append to the ORIGINAL path...
        assert w._path == path
        ev2 = {"op": "delete", "tenant_id": 2, "record_ids": [9]}
        w.append_events([ev2])
        w.close()
        # ...and replay sees both the old and the new event
        w2 = NativeWal(path, load_walstore())
        events = list(w2.replay())
        assert ev in events and ev2 in events
        w2.close()


class TestQueryValidation:
    def test_huge_k_rejected(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 0, "modality": "text", "terms": ["a"],
            "k": 2_000_000_000,
        }).encode())
        assert resp.status == 400
        assert "k must be" in jbody(resp)["message"]

    def test_string_terms_rejected(self, tmp_path):
        # a bare string would silently split into characters
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 0, "modality": "text", "terms": "hello",
        }).encode())
        assert resp.status == 400

    @pytest.mark.parametrize("vec", [123, "abc", ["a"], [1.0, None]])
    def test_bad_vector_is_400_not_500(self, tmp_path, vec):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 0, "modality": "text", "vector": vec,
        }).encode())
        assert resp.status == 400

    def test_bad_vectors_batch_is_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 0, "modality": "text", "vectors": [["a"]],
        }).encode())
        assert resp.status == 400

    def test_float_record_id_rejected(self, tmp_path):
        # a float passes Record's range check but would crash the native
        # WAL encoder MID-BATCH (torn log -> phantom rows on replay)
        app, _ = make_app(tmp_path)
        resp = call(app, "PUT", "/v1/records", json.dumps({
            "records": [{"tenant_id": 0, "record_id": 1.5,
                         "modality": "text", "algorithm": "a",
                         "fingerprint": [1]}],
        }).encode())
        assert resp.status == 400
        assert "record_id" in jbody(resp)["message"]

    def test_ndjson_scalar_line_is_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1/stream",
                    b'5\n{"chunk":"ok words here"}\n')
        assert resp.status == 400
        assert jbody(resp)["error"] == "bad_ndjson"
        resp = call(app, "POST", "/v1/ingest/text/0/1/stream",
                    b'{"chunk": 5}\n')
        assert resp.status == 400


class TestAudioIndexSegregation:
    def test_wang_query_never_matches_panako_records(self, tmp_path):
        """Wang and panako hashes share the u32 space; the landmark index
        must be per-(tenant, algorithm) so queries never cross."""
        import asyncio as aio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        be = EmbeddedBackend(str(tmp_path / "db"))
        pairs = np.arange(40, dtype="<u4").tobytes()  # 20 (hash, t) pairs
        aio.run(be.upsert([Record(1, 7, Modality.AUDIO,
                                  "audiofp-panako-v1", pairs)]))
        hits = aio.run(be.knn_audio(1, "audiofp-wang-v1", pairs, 5))
        assert hits == []  # same bytes, wrong algorithm: no hit
        hits = aio.run(be.knn_audio(1, "audiofp-panako-v1", pairs, 5))
        assert hits and hits[0].record_id == 7
        be.close()


class TestHaitsmaStaleStream:
    def test_misaligned_reupsert_evicts_stream(self, tmp_path):
        import asyncio as aio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        be = EmbeddedBackend(str(tmp_path / "db"))
        frames = np.arange(64, dtype="<u4").tobytes()
        aio.run(be.upsert([Record(1, 3, Modality.AUDIO,
                                  "audiofp-haitsma-v1", frames)]))
        assert aio.run(be.knn_haitsma(1, frames, 3))
        # replace with a NON-4-aligned fingerprint: the old stream must
        # not keep answering for the replaced record
        aio.run(be.upsert([Record(1, 3, Modality.AUDIO,
                                  "audiofp-haitsma-v1", b"odd")]))
        assert aio.run(be.knn_haitsma(1, frames, 3)) == []
        be.close()


class TestRetrievalStackFixes:
    def test_negative_rrf_k_is_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 0, "modality": "text", "terms": ["a"],
            "vector": [1.0, 0.0], "rrf_k": -1,
        }).encode())
        assert resp.status == 400
        assert "rrf_k" in jbody(resp)["message"]

    def test_matcher_surfaces_filter_on_terms_only(self, tmp_path):
        import asyncio as aio

        from ucfp_tpu.core import Modality, Query, UnsupportedError
        from ucfp_tpu.index.embedded import EmbeddedBackend
        from ucfp_tpu.matcher import Matcher

        be = EmbeddedBackend(str(tmp_path / "db"))
        m = Matcher(be)
        q = Query(tenant_id=0, modality=Modality.TEXT, terms=["foo"],
                  filter=b"x")
        with pytest.raises(UnsupportedError):
            aio.run(m.search(q))
        be.close()

    def test_idf_map_bridges_tokenizer_mismatch(self, tmp_path):
        import asyncio as aio

        from ucfp_tpu.core import Modality, Record
        from ucfp_tpu.index.embedded import EmbeddedBackend

        be = EmbeddedBackend(str(tmp_path / "db"))
        recs = [Record(0, i, Modality.TEXT, "a", b"x",
                       text=f"snake case document {i} filler words")
                for i in range(4)]
        recs.append(Record(0, 99, Modality.TEXT, "a", b"x",
                           text="snake only here"))
        aio.run(be.upsert(recs))
        # the TEXT tokenizer keeps "snake_case" whole; BM25 split it —
        # the idf map must bridge via subtokens (max sub-IDF)
        idf = be.bm25_idf_map(0, ["snake_case", "document"])
        assert "snake_case" in idf and idf["snake_case"] > 0
        assert "document" in idf
        be.close()

    def test_streaming_minhash_failed_finalize_not_poisoned(self):
        from ucfp_tpu.core import ModalityError
        from ucfp_tpu.modality.text import StreamingMinHashSession

        s = StreamingMinHashSession(0, 1)
        s.push("   \n\t  ")
        with pytest.raises(ModalityError):
            s.finalize()
        # the failure must not have consumed the session
        s.push("now some real words to fingerprint")
        rec = s.finalize()
        assert rec.fingerprint

    def test_bm25_engines_agree_on_oversized_tokens(self, tmp_path):
        from ucfp_tpu.index.bm25 import Bm25Engine, make_engine

        giant = "x" * 70_000
        text = f"{giant} normal words here"
        py = Bm25Engine()
        py.upsert_one(0, 1, text)
        nat = make_engine(prefer_native=True)
        nat.upsert_one(0, 1, text)
        # the giant token is dropped by BOTH tokenizers; corpus stats and
        # searchability agree
        assert py.stats(0)["doc_count"] == nat.stats(0)["doc_count"] == 1
        assert [d for d, _ in py.search(0, ["normal"], 5)] == \
               [d for d, _ in nat.search(0, ["normal"], 5)] == [1]
        assert py.search(0, [giant], 5) == []
        assert nat.search(0, [giant], 5) == []

    def test_native_term_table_reclaims_dead_terms(self):
        from ucfp_tpu.index.bm25 import make_engine

        eng = make_engine(prefer_native=True)
        if type(eng).__name__ != "NativeBm25Engine":
            pytest.skip("no toolchain")
        # churn unique vocabulary through one doc id: dead terms must be
        # reclaimed, keeping live_terms (and the intern table) bounded
        for i in range(50):
            eng.upsert_one(0, 1, f"unique{i}token{i} shared words")
        st = eng.stats(0)
        assert st["doc_count"] == 1
        # only the final doc's terms are live
        assert st["terms"] <= 4
        assert [d for d, _ in eng.search(0, ["unique49token49"], 5)] == [1]
        assert eng.search(0, ["unique0token0"], 5) == []


class TestQueryFilterSupport:
    """{"algorithm"/"model_id"} filters: device-masked vector top-k and
    post-filtered BM25 — a capability beyond the reference's
    unimplemented filter contract. Unsupported shapes still 501."""

    def _seed(self, app):
        import math

        recs = []
        for i in range(8):
            ang = i * math.pi / 16
            recs.append({
                "tenant_id": 1, "record_id": i, "modality": "text",
                "algorithm": "alg-a" if i % 2 == 0 else "alg-b",
                "fingerprint": [1],
                "embedding": [math.cos(ang), math.sin(ang)],
            })
        resp = call(app, "PUT", "/v1/records",
                    json.dumps({"records": recs}).encode())
        assert resp.status == 200

    def test_vector_filter_masks_on_device(self, tmp_path):
        app, _ = make_app(tmp_path)
        self._seed(app)
        body = json.dumps({
            "tenant_id": 1, "modality": "text", "k": 8,
            "vector": [1.0, 0.0], "filter": {"algorithm": "alg-b"},
        }).encode()
        resp = call(app, "POST", "/v1/query", body)
        assert resp.status == 200
        hits = jbody(resp)["hits"]
        assert hits and all(h["record_id"] % 2 == 1 for h in hits)
        assert len(hits) == 4  # exactly the alg-b rows

    def test_filter_unknown_value_empty(self, tmp_path):
        app, _ = make_app(tmp_path)
        self._seed(app)
        body = json.dumps({
            "tenant_id": 1, "modality": "text", "k": 3,
            "vector": [1.0, 0.0], "filter": {"algorithm": "never-seen"},
        }).encode()
        resp = call(app, "POST", "/v1/query", body)
        assert resp.status == 200 and jbody(resp)["hits"] == []

    def test_terms_filter_post_applied(self, tmp_path):
        app, _ = make_app(tmp_path)
        recs = [
            {"tenant_id": 1, "record_id": 10, "modality": "text",
             "algorithm": "alg-a", "fingerprint": [1],
             "text": "shared token document one"},
            {"tenant_id": 1, "record_id": 11, "modality": "text",
             "algorithm": "alg-b", "fingerprint": [1],
             "text": "shared token document two"},
        ]
        call(app, "PUT", "/v1/records",
             json.dumps({"records": recs}).encode())
        body = json.dumps({
            "tenant_id": 1, "modality": "text", "k": 5,
            "terms": ["shared"], "filter": {"algorithm": "alg-a"},
        }).encode()
        resp = call(app, "POST", "/v1/query", body)
        assert resp.status == 200
        assert [h["record_id"] for h in jbody(resp)["hits"]] == [10]

    def test_bad_shapes_still_501(self, tmp_path):
        app, _ = make_app(tmp_path)
        for flt in ({"field": "x"}, {"algorithm": 3}, {}, "alg-a"):
            body = json.dumps({
                "tenant_id": 1, "modality": "text", "k": 3,
                "vector": [1.0, 0.0], "filter": flt,
            }).encode()
            assert call(app, "POST", "/v1/query", body).status == 501

    def test_fingerprint_query_filter_501(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = json.dumps({
            "tenant_id": 1, "modality": "image", "k": 3,
            "fingerprint_hex": "00" * 8,
            "algorithm": "imgfprint-phash-v1",
            "filter": {"algorithm": "x"},
        }).encode()
        assert call(app, "POST", "/v1/query", body).status == 501
