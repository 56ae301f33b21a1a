"""HTTP integration tests: full router through handle_request, no sockets.

Mirrors the reference's tower::oneshot approach (src/server/tests.rs):
synthetic PNG/sine inputs, trait-object fakes injected through the same
DI seams (ApiKeyLookup / TenantRateLimiter / UsageSink), auth + tenant
isolation + rate limit + usage + feature-gate + inspect coverage.
"""

import asyncio
import json

import numpy as np
import pytest

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.server.app import ServerState, build_server
from ucfp_tpu.server.auth import ApiKeyContext, ApiKeyLookup, StaticSingleKey, parse_keys_file, StaticMapKey
from ucfp_tpu.server.http import Request
from ucfp_tpu.server.inputs_cache import InputsCache
from ucfp_tpu.server.ratelimit import NoopRateLimiter, RateDecision, TenantRateLimiter
from ucfp_tpu.server.usage import LogUsageSink, NoopUsageSink

from test_imagehash import synthetic_png

TOKEN = "test-token"


def make_app(tmp_path, api_keys=None, rate=None, usage=None):
    state = ServerState(
        index=EmbeddedBackend(str(tmp_path / "db")),
        api_keys=api_keys or StaticSingleKey(TOKEN),
        rate_limit=rate or NoopRateLimiter(),
        usage=usage or NoopUsageSink(),
        inputs=InputsCache(),
    )
    # 120 s timeout: first-compile jit latency on the 1-core CPU test host
    # can exceed the production 10 s default
    return build_server(state, timeout_secs=120.0), state


def req(method, path, body=b"", token=TOKEN, headers=None, query=""):
    h = {"content-length": str(len(body))}
    if token is not None:
        h["authorization"] = f"Bearer {token}"
    if headers:
        h.update(headers)
    from urllib.parse import parse_qs

    q = {k: v[0] for k, v in parse_qs(query, keep_blank_values=True).items()}
    return Request(method, path, q, h, body)


def call(app, *args, **kw):
    async def go():
        resp, _ = await app.handle_request(req(*args, **kw))
        return resp

    return asyncio.run(go())


def jbody(resp):
    return json.loads(resp.body)


def sine_bytes(secs=2.0, sr=8000, freq=440.0):
    t = np.arange(int(secs * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype("<f4")
    # add a second band so constellation has structure
    x = x + (0.25 * np.sin(2 * np.pi * 1200.0 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0)).astype("<f4")
    return x.astype("<f4").tobytes()


class TestPublic:
    def test_healthz(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "GET", "/healthz", token=None)
        assert resp.status == 200 and jbody(resp)["status"] == "ok"

    def test_info(self, tmp_path, monkeypatch):
        # ambient UCFP_KNN_QUANT (e.g. a bench shell) must not leak in
        monkeypatch.delenv("UCFP_KNN_QUANT", raising=False)
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "GET", "/v1/info", token=None))
        assert body["name"] == "ucfp-tpu"
        assert set(body["modalities"]) == {"text", "image", "audio"}
        # the active vector-serving tier is advertised
        assert body["knn_quant"] == "none"
        assert body["query_batch_ms"] == 0.0
        # ...and a configured micro-batching window shows up
        monkeypatch.setenv("UCFP_QUERY_BATCH_MS", "7.5")
        app2, _ = make_app(tmp_path / "b")
        body2 = jbody(call(app2, "GET", "/v1/info", token=None))
        assert body2["query_batch_ms"] == 7.5

    def test_algorithms_manifest(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "GET", "/v1/algorithms", token=None))
        text_ids = {a["id"] for a in body["text"]["algorithms"]}
        assert {"minhash", "simhash-tf", "tlsh", "semantic"} <= text_ids
        wang = next(
            a for a in body["audio"]["algorithms"] if a["id"] == "wang"
        )
        defaults = {t["name"]: t["default"] for t in wang["tunables"]}
        assert defaults["fan_out"] == 10 and defaults["target_zone_t"] == 63
        assert defaults["peaks_per_sec"] == 30

    def test_dashboard_page(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "GET", "/", token=None)
        assert resp.status == 200
        assert resp.content_type.startswith("text/html")
        body = resp.body.decode()
        assert "ucfp-tpu playground" in body
        for route in ("/v1/algorithms", "/v1/pipeline/inspect/text", "/v1/query"):
            assert route in body  # the page drives the public API

    def test_metrics_endpoint(self, tmp_path):
        app, _ = make_app(tmp_path)
        call(app, "GET", "/healthz", token=None)
        resp = call(app, "GET", "/metrics", token=None)
        assert b"ucfp_http_requests_total" in resp.body
        assert b'path="/healthz"' in resp.body
        assert b'path="/metrics"' not in resp.body  # self-scrape excluded


class TestAuth:
    def test_401_without_bearer(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"hi", token=None)
        assert resp.status == 401

    def test_401_wrong_token(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"hi", token="nope")
        assert resp.status == 401

    def test_201_with_bearer(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"hello world one two three")
        assert resp.status == 201

    def test_x_api_key_fallback(self, tmp_path):
        # reference docs/authentication.md: X-Api-Key is equivalent to
        # the bearer for clients that cannot set Authorization
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/2",
                    b"hello world one two three", token=None,
                    headers={"x-api-key": TOKEN})
        assert resp.status == 201
        resp = call(app, "POST", "/v1/ingest/text/0/3", b"hi", token=None,
                    headers={"x-api-key": "wrong"})
        assert resp.status == 401

    def test_bearer_wins_over_x_api_key(self, tmp_path):
        # both present -> Authorization: Bearer decides (and a bad
        # bearer is rejected even with a valid X-Api-Key alongside)
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/4", b"hi",
                    token="nope", headers={"x-api-key": TOKEN})
        assert resp.status == 401

    def test_multi_tenant_isolation(self, tmp_path):
        keys = parse_keys_file(
            """
            [keys.alpha]
            token = "alpha-token"
            tenant_id = 1
            [keys.beta]
            token = "beta-token"
            tenant_id = 2
            """
        )
        app, _ = make_app(tmp_path, api_keys=StaticMapKey(keys))
        # tenant 1 ingests under its own id: ok
        assert call(app, "POST", "/v1/ingest/text/1/1", b"mine alone here",
                    token="alpha-token").status == 201
        # beta cannot touch tenant 1 -> 403
        resp = call(app, "GET", "/v1/records/1/1", token="beta-token")
        assert resp.status == 403
        # alpha describes its own record
        assert call(app, "GET", "/v1/records/1/1", token="alpha-token").status == 200

    def test_service_bearer_tenant0_any(self, tmp_path):
        app, _ = make_app(tmp_path)  # StaticSingleKey -> tenant 0
        assert call(app, "POST", "/v1/ingest/text/42/1",
                    b"service bearer writes anywhere").status == 201


class CountingRateLimiter(TenantRateLimiter):
    """Allow N then deny (the reference's fake, tests.rs:783-816)."""

    def __init__(self, allow: int):
        self.allow = allow
        self.seen = 0

    async def check(self, tenant_id, rate_class="default"):
        self.seen += 1
        if self.seen <= self.allow:
            return RateDecision(allowed=True, remaining=self.allow - self.seen)
        return RateDecision(allowed=False, retry_after_ms=1500)


class TestRateLimitAndUsage:
    def test_429_with_retry_after(self, tmp_path):
        app, _ = make_app(tmp_path, rate=CountingRateLimiter(2))
        assert call(app, "POST", "/v1/ingest/text/0/1", b"one two three x").status == 201
        assert call(app, "POST", "/v1/ingest/text/0/2", b"one two three y").status == 201
        resp = call(app, "POST", "/v1/ingest/text/0/3", b"one two three z")
        assert resp.status == 429
        assert resp.headers.get("retry-after") == "1"

    def test_ratelimit_headers_on_success(self, tmp_path):
        from ucfp_tpu.server.ratelimit import InMemoryTokenBucket

        app, _ = make_app(tmp_path, rate=InMemoryTokenBucket(100, 200))
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"rate limited hello")
        assert resp.status == 201
        assert int(resp.headers["x-ratelimit-remaining"]) >= 0
        assert int(resp.headers["x-ratelimit-reset-ms"]) >= 0
        assert resp.headers["x-ratelimit-limit"] == "200"  # bucket size

    def test_429_carries_limit_headers(self, tmp_path):
        from ucfp_tpu.server.ratelimit import InMemoryTokenBucket

        # burst of 2: third call in the same instant is denied
        app, _ = make_app(tmp_path, rate=InMemoryTokenBucket(0.5, 2))
        assert call(app, "GET", "/v1/records/0/1").status in (200, 404)
        assert call(app, "GET", "/v1/records/0/1").status in (200, 404)
        resp = call(app, "GET", "/v1/records/0/1")
        assert resp.status == 429
        assert resp.headers["x-ratelimit-limit"] == "2"
        assert resp.headers["x-ratelimit-remaining"] == "0"
        assert "retry-after" in resp.headers

    def test_usage_ndjson(self, tmp_path):
        log = tmp_path / "usage.ndjson"
        app, _ = make_app(tmp_path, usage=LogUsageSink(str(log)))

        async def go():
            await app.handle_request(
                req("POST", "/v1/ingest/text/0/1", b"hello usage meter")
            )
            await asyncio.sleep(0.05)  # fire-and-forget task drain

        asyncio.run(go())
        lines = [json.loads(l) for l in log.read_text().splitlines()]
        assert lines and lines[0]["op"] == "ingest"
        assert lines[0]["tenant_id"] == 0 and lines[0]["status"] == 201


class TestIngestText:
    def test_minhash_round_trip(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1",
                    "the quick brown fox jumps over the lazy dog".encode())
        body = jbody(resp)
        assert body["algorithm"] == "minhash-h128"
        assert body["fingerprint_bytes"] == 1032
        assert len(body["fingerprint_hex"]) == 2064
        assert body["fingerprint_hex"][:16] == "0100000000000000"

    def test_opts_via_query(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/text/0/1",
                          b"alpha beta gamma delta", query="algorithm=minhash&h=64&k=2"))
        assert body["algorithm"] == "minhash-h64"
        assert body["fingerprint_bytes"] == 8 + 64 * 8

    def test_tlsh_and_errors(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"too short",
                    query="algorithm=tlsh")
        assert resp.status == 400
        long = ("the quick brown fox jumps over the lazy dog " * 4).encode()
        body = jbody(call(app, "POST", "/v1/ingest/text/0/2", long,
                          query="algorithm=tlsh"))
        assert body["fingerprint_bytes"] == 70

    def test_semantic_returns_embedding(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/text/0/3",
                          b"semantic content here",
                          query="algorithm=semantic&return_embedding=1"))
        assert body["has_embedding"] and len(body["embedding"]) == 384

    def test_semantic_external_requires_key_400(self, tmp_path):
        # remote providers are implemented (tests/test_providers.py runs
        # them against stub servers); without a key the request is a
        # client error, not a 501 stub
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/4", b"text",
                    query="algorithm=semantic&provider=openai")
        assert resp.status == 400
        assert jbody(resp)["error"] == "modality"

    def test_tunables_validated_against_manifest(self, tmp_path):
        app, _ = make_app(tmp_path)
        # h above the manifest max (1024): 400, not a mega-signature
        resp = call(app, "POST", "/v1/ingest/text/0/1", b"some text here",
                    query="algorithm=minhash&h=1000000")
        assert resp.status == 400
        assert b"within" in resp.body
        # audio fan_out above max
        import numpy as np

        body = np.zeros(8192, "<f4").tobytes()
        resp = call(app, "POST", "/v1/ingest/audio/0/2", body,
                    query="sample_rate=8000&algorithm=wang&fan_out=9999")
        assert resp.status == 400

    def test_bad_utf8_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/text/0/5", b"\xff\xfe\xfd")
        assert resp.status == 400

    def test_stream_ndjson(self, tmp_path):
        app, _ = make_app(tmp_path)
        nd = b'{"chunk": "the quick brown "}\n{"chunk": "fox jumps over the lazy dog"}\n'
        body = jbody(call(app, "POST", "/v1/ingest/text/0/6/stream", nd))
        whole = jbody(call(app, "POST", "/v1/ingest/text/0/7",
                           b"the quick brown fox jumps over the lazy dog"))
        assert body["fingerprint_hex"] == whole["fingerprint_hex"]


class TestIngestImage:
    def test_multi_536(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/image/0/1", synthetic_png(64, 64)))
        assert body["algorithm"] == "imgfprint-multi-v1"
        assert body["fingerprint_bytes"] == 536
        assert len(body["fingerprint_hex"]) == 1072

    def test_single_algos(self, tmp_path):
        app, _ = make_app(tmp_path)
        for algo in ("phash", "dhash", "ahash"):
            body = jbody(call(app, "POST", "/v1/ingest/image/0/2",
                              synthetic_png(64, 64), query=f"algorithm={algo}"))
            assert body["fingerprint_bytes"] == 8

    def test_semantic_image(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/image/0/3",
                          synthetic_png(64, 64),
                          query="algorithm=semantic&return_embedding=1"))
        assert len(body["embedding"]) == 512

    def test_decode_error_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/image/0/4", b"not an image")
        assert resp.status == 400


class TestIngestImageBatch:
    """Batched image ingest: one device batch + one WAL commit."""

    @staticmethod
    def _frames(pairs):
        import struct

        out = bytearray()
        for rid, img in pairs:
            out += struct.pack("<QI", rid, len(img))
            out += img
        return bytes(out)

    def test_batch_matches_single_route(self, tmp_path):
        app, _ = make_app(tmp_path)
        imgs = [(10, synthetic_png(64, 64)), (11, synthetic_png(32, 32)),
                (12, synthetic_png(64, 64))]
        body = jbody(call(app, "POST", "/v1/ingest/image/batch/0",
                          self._frames(imgs), query="algorithm=phash"))
        assert body["count"] == 3
        by_rid = {r["record_id"]: r for r in body["records"]}
        for rid, img in imgs:
            single = jbody(call(app, "POST", f"/v1/ingest/image/0/{100 + rid}",
                                img, query="algorithm=phash"))
            assert by_rid[rid]["fingerprint_hex"] == single["fingerprint_hex"]

    def test_batch_multi_and_describe(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/image/batch/0",
                          self._frames([(1, synthetic_png(64, 64))])))
        assert body["algorithm"] == "imgfprint-multi-v1"
        assert body["records"][0]["fingerprint_bytes"] == 536
        # stored durably: describe finds it
        meta = jbody(call(app, "GET", "/v1/records/0/1"))
        assert meta["algorithm"] == "imgfprint-multi-v1"

    def test_truncated_frame_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        good = self._frames([(1, synthetic_png(32, 32))])
        assert call(app, "POST", "/v1/ingest/image/batch/0",
                    good[:-5], query="algorithm=phash").status == 400
        assert call(app, "POST", "/v1/ingest/image/batch/0",
                    good[:6], query="algorithm=phash").status == 400
        assert call(app, "POST", "/v1/ingest/image/batch/0",
                    b"", query="algorithm=phash").status == 400

    def test_semantic_not_batched_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/image/batch/0",
                    self._frames([(1, synthetic_png(32, 32))]),
                    query="algorithm=semantic")
        assert resp.status == 400

    def test_tenant_guard_403(self, tmp_path):
        class TenantOneKey(ApiKeyLookup):
            async def lookup(self, token):
                return (ApiKeyContext(tenant_id=1, key_id="k1")
                        if token == TOKEN else None)

        app, _ = make_app(tmp_path, api_keys=TenantOneKey())
        resp = call(app, "POST", "/v1/ingest/image/batch/2",
                    self._frames([(1, synthetic_png(32, 32))]))
        assert resp.status == 403


class TestIngestAudio:
    def test_wang(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/audio/0/1", sine_bytes(),
                          query="sample_rate=8000&algorithm=wang"))
        assert body["algorithm"] == "audiofp-wang-v1"
        assert body["fingerprint_bytes"] > 0
        assert body["fingerprint_bytes"] % 8 == 0

    def test_haitsma(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/audio/0/2", sine_bytes(secs=3.0),
                          query="sample_rate=8000&algorithm=haitsma"))
        assert body["algorithm"] == "audiofp-haitsma-v1"

    def test_alignment_400(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/audio/0/3", b"\x00\x01\x02",
                    query="sample_rate=8000")
        assert resp.status == 400

    def test_sample_rate_required(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/audio/0/4", sine_bytes())
        assert resp.status == 400

    def test_watermark_report(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/audio/0/5", sine_bytes(secs=5.0),
                          query="sample_rate=8000&algorithm=watermark",
                          headers={"x-watermark-key": "tenant-secret"}))
        assert body["detected"] is False and "confidence" in body

    def test_watermark_requires_key(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/ingest/audio/0/5", sine_bytes(secs=5.0),
                    query="sample_rate=8000&algorithm=watermark")
        assert resp.status == 400

    def test_stream_segments(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/audio/0/6/stream",
                          sine_bytes(secs=5.0),
                          query="sample_rate=8000&segment_secs=2"))
        assert body["segments"] >= 2


class TestRecordsAndQuery:
    def test_raw_record_upsert_describe_delete(self, tmp_path):
        app, _ = make_app(tmp_path)
        rec = {
            "tenant_id": 0, "record_id": 9, "modality": "text",
            "format_version": 1, "algorithm": "custom-v1", "config_hash": 5,
            "fingerprint": [1, 2, 3, 4], "embedding": [1.0, 0.0],
        }
        resp = call(app, "PUT", "/v1/records", json.dumps(rec).encode())
        assert jbody(resp)["upserted"] == 1
        d = jbody(call(app, "GET", "/v1/records/0/9"))
        assert d["algorithm"] == "custom-v1" and d["has_embedding"]
        assert call(app, "DELETE", "/v1/records/0/9").status == 200
        assert call(app, "GET", "/v1/records/0/9").status == 404

    def test_vector_query(self, tmp_path):
        app, _ = make_app(tmp_path)
        for rid, emb in ((1, [1.0, 0.0]), (2, [0.0, 1.0])):
            rec = {"tenant_id": 0, "record_id": rid, "modality": "text",
                   "algorithm": "e", "fingerprint": [0], "embedding": emb}
            call(app, "PUT", "/v1/records", json.dumps(rec).encode())
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 1, "vector": [1.0, 0.0]}).encode()))
        assert [h["record_id"] for h in body["hits"]] == [1]
        assert body["hits"][0]["source"] == "vector"

    def test_hybrid_query_with_explain(self, tmp_path):
        app, _ = make_app(tmp_path)
        call(app, "POST", "/v1/ingest/text/0/1", b"apple pie recipe baking")
        call(app, "POST", "/v1/ingest/text/0/2", b"banana bread baking")
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 5, "terms": ["apple"]}).encode(),
                          query="explain=1"))
        assert [h["record_id"] for h in body["hits"]] == [1]
        assert body["hits"][0]["term_hits"][0]["term"] == "apple"

    def test_hash_query(self, tmp_path):
        app, _ = make_app(tmp_path)
        png = synthetic_png(64, 64)
        b1 = jbody(call(app, "POST", "/v1/ingest/image/0/1", png,
                        query="algorithm=phash"))
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "image", "k": 3,
                                      "fingerprint_hex": b1["fingerprint_hex"],
                                      "algorithm": "imgfprint-phash-v1"}).encode()))
        assert body["hits"][0]["record_id"] == 1
        assert body["hits"][0]["score"] == pytest.approx(1.0)

    def test_text_batch_route(self, tmp_path):
        """NDJSON batch text ingest: one WAL commit, fingerprints
        byte-identical to the single route, per-line error capture
        (bad rows must not sink the valid remainder)."""
        app, _ = make_app(tmp_path)
        lines = "\n".join(
            json.dumps({"record_id": i, "text": f"doc {i} quick brown fox"})
            for i in (1, 2, 3)
        )
        body = jbody(call(app, "POST", "/v1/ingest/text/batch/0",
                          lines.encode()))
        assert body["count"] == 3
        assert body["algorithm"] == "minhash-h128"
        single = jbody(call(app, "POST", "/v1/ingest/text/0/9",
                            b"doc 1 quick brown fox"))
        assert body["records"][0]["fingerprint_hex"] == \
            single["fingerprint_hex"]
        # durable + queryable
        got = jbody(call(app, "GET", "/v1/records/0/2"))
        assert got["algorithm"] == "minhash-h128"
        # per-line errors: empty doc + non-JSON line captured, valid
        # row still ingests
        mixed = "\n".join([
            json.dumps({"record_id": 10, "text": ""}),
            json.dumps({"record_id": 11, "text": "good document body"}),
            "not json at all",
        ])
        b2 = jbody(call(app, "POST", "/v1/ingest/text/batch/0",
                        mixed.encode()))
        assert b2["count"] == 1
        assert len(b2["errors"]) == 2
        assert jbody(call(app, "GET", "/v1/records/0/11"))[
            "fingerprint_bytes"] == 1032
        # quiet mode skips per-record hex; lsh batch rides the band
        # buckets exactly like the single route
        llines = json.dumps({"record_id": 20, "text": "lsh batch body"})
        b3 = jbody(call(app, "POST", "/v1/ingest/text/batch/0",
                        llines.encode(), query="algorithm=lsh&quiet=1"))
        assert b3 == {"count": 1, "algorithm": "minhash-lsh-h128"}
        # unsupported family -> 400
        resp = call(app, "POST", "/v1/ingest/text/batch/0",
                    llines.encode(), query="algorithm=semantic")
        assert resp.status == 400
        # U+2028 is a legal raw char inside JSON strings: the parser
        # must split on \n only, never str.splitlines()
        u = json.dumps({"record_id": 30,
                        "text": "line separator inside"},
                       ensure_ascii=False)
        b4 = jbody(call(app, "POST", "/v1/ingest/text/batch/0",
                        u.encode("utf-8")))
        assert b4["count"] == 1 and "errors" not in b4
        # out-of-u64-range record_id is a per-line error, not a 500
        # that loses the valid sibling
        rng_bad = "\n".join([
            json.dumps({"record_id": -1, "text": "negative id doc"}),
            json.dumps({"record_id": 31, "text": "valid sibling doc"}),
        ])
        b5 = jbody(call(app, "POST", "/v1/ingest/text/batch/0",
                        rng_bad.encode()))
        assert b5["count"] == 1 and len(b5["errors"]) == 1
        # all-rows-failed keeps the error envelope fields
        b6r = call(app, "POST", "/v1/ingest/text/batch/0",
                   b"not json")
        assert b6r.status == 400
        b6 = jbody(b6r)
        assert b6["error"] == "batch_failed" and b6["errors"]
        # non-integer tenant segments answer 400 bad_path, not 500
        for path in ("/v1/ingest/text/batch/abc",
                     "/v1/ingest/image/batch/abc"):
            r = call(app, "POST", path, b"x")
            assert r.status == 400, path
            assert jbody(r)["error"] == "bad_path"

    def test_batched_fingerprints_route_specialized_matchers(self, tmp_path):
        """Batched fingerprints_hex must use the SAME per-algorithm
        matcher as the single-fingerprint path: raw Hamming is the
        wrong metric for LSH slot agreement and landmark offset voting
        (a batch must not silently change match semantics)."""
        app, _ = make_app(tmp_path)
        # LSH: ingest two docs, batch-query both stored fingerprints
        call(app, "POST", "/v1/ingest/text/0/11",
             b"the quick brown fox jumps over the lazy dog",
             query="algorithm=lsh")
        call(app, "POST", "/v1/ingest/text/0/12",
             b"entirely different content about bread baking recipes",
             query="algorithm=lsh")
        fp11 = jbody(call(app, "GET",
                          "/v1/records/0/11", query="include=fingerprint"))
        fp12 = jbody(call(app, "GET",
                          "/v1/records/0/12", query="include=fingerprint"))
        batch = jbody(call(app, "POST", "/v1/query",
                           json.dumps({"tenant_id": 0, "modality": "text",
                                       "k": 2, "algorithm": "lsh",
                                       "fingerprints_hex":
                                           [fp11["fingerprint_hex"],
                                            fp12["fingerprint_hex"]]}
                                      ).encode()))
        for i, (fph, want) in enumerate(
                ((fp11, 11), (fp12, 12))):
            single = jbody(call(app, "POST", "/v1/query",
                                json.dumps({"tenant_id": 0,
                                            "modality": "text", "k": 2,
                                            "algorithm": "minhash-lsh-h128",
                                            "fingerprint_hex":
                                                fph["fingerprint_hex"]}
                                           ).encode()))
            got = [(h["record_id"], round(h["score"], 6))
                   for h in batch["results"][i]["hits"]]
            ref = [(h["record_id"], round(h["score"], 6))
                   for h in single["hits"]]
            assert got == ref and got[0][0] == want
        # wang: the batched route must run offset voting, not Hamming
        call(app, "POST", "/v1/ingest/audio/0/21", sine_bytes(),
             query="sample_rate=8000&algorithm=wang")
        fpa = jbody(call(app, "GET", "/v1/records/0/21",
                         query="include=fingerprint"))
        batch = jbody(call(app, "POST", "/v1/query",
                           json.dumps({"tenant_id": 0, "modality": "audio",
                                       "k": 1, "algorithm": "wang",
                                       "fingerprints_hex":
                                           [fpa["fingerprint_hex"]]}
                                      ).encode()))
        assert batch["results"][0]["hits"][0]["record_id"] == 21
        assert batch["results"][0]["hits"][0]["score"] > 0.9  # vote frac

    def test_vector_filter_accepts_friendly_alias(self, tmp_path):
        """{"filter": {"algorithm": "semantic"-style friendly id}} must
        canonicalize like the fingerprint queries — records carry
        canonical tags, so an unmapped alias silently matched zero
        rows."""
        app, _ = make_app(tmp_path)
        call(app, "POST", "/v1/ingest/text/0/31", b"filter alias target",
             query="algorithm=semantic")
        rec = jbody(call(app, "GET", "/v1/records/0/31",
                         query="include=embedding"))
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 3,
                                      "vector": rec["embedding"],
                                      "filter": {"algorithm":
                                                 rec["algorithm"]}}
                                     ).encode()))
        assert body["hits"][0]["record_id"] == 31
        # the friendly "semantic" id resolves per modality (text ->
        # embedding-local)
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 3,
                                      "vector": rec["embedding"],
                                      "filter": {"algorithm": "semantic"}}
                                     ).encode()))
        assert body["hits"][0]["record_id"] == 31
        # an image-friendly alias through the filter path: no image
        # records -> zero hits, but canonicalization must not 400
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 3,
                                      "vector": rec["embedding"],
                                      "filter": {"algorithm": "phash"}}
                                     ).encode()))
        assert body["hits"] == []

    def test_minhash_alias_and_wide_fingerprint_marker(self, tmp_path):
        """The default text algorithm's friendly id (minhash) must
        canonicalize too, and wide fingerprints (W=258 words) must
        never be marked approximate — they ride the exact XLA kernel
        (the fused kernel's VMEM tile budget caps W at 16)."""
        app, state = make_app(tmp_path)
        call(app, "POST", "/v1/ingest/text/0/41", b"minhash alias body")
        fp = jbody(call(app, "GET", "/v1/records/0/41",
                        query="include=fingerprint"))
        assert fp["algorithm"] == "minhash-h128"
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "text",
                                      "k": 2, "algorithm": "minhash",
                                      "fingerprint_hex":
                                          fp["fingerprint_hex"]}
                                     ).encode()))
        assert body["hits"][0]["record_id"] == 41
        assert not state.index.fingerprint_is_approximate(
            0, "minhash-h128", 2)

    def test_hash_query_accepts_friendly_alias(self, tmp_path):
        """The ingest routes take ?algorithm=phash, so the fingerprint
        query paths must canonicalize the same friendly ids — the store
        keys its Hamming caches on the canonical tag, and an unmapped
        alias silently returned zero hits."""
        app, _ = make_app(tmp_path)
        png = synthetic_png(64, 64)
        b1 = jbody(call(app, "POST", "/v1/ingest/image/0/1", png,
                        query="algorithm=phash"))
        # single
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "image",
                                      "k": 3,
                                      "fingerprint_hex": b1["fingerprint_hex"],
                                      "algorithm": "phash"}).encode()))
        assert body["hits"][0]["record_id"] == 1
        # batched
        body = jbody(call(app, "POST", "/v1/query",
                          json.dumps({"tenant_id": 0, "modality": "image",
                                      "k": 3,
                                      "fingerprints_hex":
                                          [b1["fingerprint_hex"]],
                                      "algorithm": "phash"}).encode()))
        assert body["results"][0]["hits"][0]["record_id"] == 1


class TestInputsCacheRoutes:
    def test_put_ingest_delete(self, tmp_path):
        app, _ = make_app(tmp_path)
        png = synthetic_png(64, 64)
        put = jbody(call(app, "POST", "/v1/inputs/0", png))
        iid = put["input_id"]
        body = jbody(call(app, "POST", "/v1/ingest/image/0/1", b"",
                          query=f"input_id={iid}"))
        assert body["fingerprint_bytes"] == 536
        assert call(app, "DELETE", f"/v1/inputs/0/{iid}").status == 200
        resp = call(app, "POST", "/v1/ingest/image/0/2", b"", query=f"input_id={iid}")
        assert resp.status == 404


class TestInspectRoutes:
    def test_text(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/pipeline/inspect/text",
                          b"Hello World Hello There Friend"))
        assert body["canonicalized"].startswith("hello")
        assert body["fingerprint_bytes"] == 1032

    def test_image(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/pipeline/inspect/image",
                          synthetic_png(64, 64)))
        assert body["fingerprint_bytes"] == 536
        assert body["gray32_png_b64"] and body["gray8_png_b64"]

    def test_audio(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/pipeline/inspect/audio",
                          sine_bytes(secs=1.0), query="sample_rate=8000"))
        assert body["total_peaks"] > 0
        assert len(body["envelope"]) == 256


class TestErrors:
    def test_404_route(self, tmp_path):
        app, _ = make_app(tmp_path)
        assert call(app, "GET", "/nope", token=None).status == 404

    def test_405_method(self, tmp_path):
        app, _ = make_app(tmp_path)
        assert call(app, "DELETE", "/healthz", token=None).status == 405

    def test_error_envelope_shape(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = jbody(call(app, "POST", "/v1/ingest/text/0/1", b"\xff"))
        assert set(body) == {"error", "message"}


class TestRecordListing:
    """GET /v1/records/{tenant} — paginated insertion-order listing
    (extension; the reference keeps its records list client-side)."""

    def _seed(self, app, n=7, tenant=3):
        for i in range(n):
            assert call(app, "POST", f"/v1/ingest/text/{tenant}/{100 + i}",
                        f"listing document {i} words".encode()).status == 201

    def test_pagination(self, tmp_path):
        app, _ = make_app(tmp_path)
        self._seed(app)
        resp = call(app, "GET", "/v1/records/3", query="offset=0&limit=3")
        body = jbody(resp)
        assert body["total"] == 7
        assert [r["record_id"] for r in body["records"]] == [100, 101, 102]
        resp = call(app, "GET", "/v1/records/3", query="offset=5&limit=3")
        body = jbody(resp)
        assert [r["record_id"] for r in body["records"]] == [105, 106]
        assert body["records"][0]["algorithm"].startswith("minhash")

    def test_delete_and_survives_reopen(self, tmp_path):
        app, state = make_app(tmp_path)
        self._seed(app, n=3)
        call(app, "DELETE", "/v1/records/3/101")
        body = jbody(call(app, "GET", "/v1/records/3"))
        assert [r["record_id"] for r in body["records"]] == [100, 102]
        state.index.close()
        # replay rebuilds the listing table
        app2, _ = make_app(tmp_path)
        body = jbody(call(app2, "GET", "/v1/records/3"))
        assert [r["record_id"] for r in body["records"]] == [100, 102]

    def test_tenant_guard(self, tmp_path):
        keys = parse_keys_file("""
[keys.a]
token = "ka"
tenant_id = 1
""")
        app, _ = make_app(tmp_path, api_keys=StaticMapKey(keys))
        assert call(app, "GET", "/v1/records/2", token="ka").status == 403
        assert call(app, "GET", "/v1/records/1", token="ka").status == 200


class TestWarmup:
    def test_warmup_compiles_all_kernel_families(self):
        from ucfp_tpu.server import warmup

        t = warmup.start_background_warmup()
        t.join(timeout=300)
        assert not t.is_alive()
        # and the kernels are actually warm: a follow-up call is quick
        from ucfp_tpu.modality import text as tmod

        rec = tmod.fingerprint_minhash("post warmup text", 0, 1)
        assert rec.fingerprint


class TestEmbeddingBatchRoute:
    """POST /v1/ingest/embedding/batch/{tenant}: binary f32 rows ->
    one WAL run commit (the remote twin of upsert_embedding_batch)."""

    @staticmethod
    def _body(rids, mat):
        import struct

        out = bytearray()
        for rid, row in zip(rids, mat):
            b = np.asarray(row, np.float32).tobytes()
            out += struct.pack("<QI", rid, len(b))
            out += b
        return bytes(out)

    def test_batch_then_query_and_describe(self, tmp_path):
        app, state = make_app(tmp_path)
        rng = np.random.default_rng(8)
        mat = rng.standard_normal((12, 16), dtype=np.float32)
        rids = list(range(300, 312))
        r = call(app, "POST", "/v1/ingest/embedding/batch/4",
                 self._body(rids, mat),
                 query="model_id=bge&config_hash=9")
        assert r.status == 201, r.body
        body = jbody(r)
        assert body == {"count": 12, "dim": 16,
                        "algorithm": "embedding-local"}
        q = jbody(call(app, "POST", "/v1/query", json.dumps({
            "tenant_id": 4, "modality": "text", "k": 3,
            "vector": mat[7].tolist(),
            "filter": {"algorithm": "embedding-local",
                       "model_id": "bge"}}).encode()))
        assert q["hits"][0]["record_id"] == 307
        d = jbody(call(app, "GET", "/v1/records/4/305",
                       query="include=embedding"))
        assert d["has_embedding"] and d["embedding_dim"] == 16
        assert d["config_hash"] == 9 and d["model_id"] == "bge"
        assert d["embedding"] == pytest.approx(mat[5].tolist())
        # fingerprint is the row's f32-LE bytes (semantic-route parity)
        fp = jbody(call(app, "GET", "/v1/records/4/305",
                        query="include=fingerprint"))["fingerprint_hex"]
        assert bytes.fromhex(fp) == mat[5].tobytes()
        state.index.close()

    def test_batch_survives_restart(self, tmp_path):
        app, state = make_app(tmp_path)
        mat = np.eye(4, dtype=np.float32)
        r = call(app, "POST", "/v1/ingest/embedding/batch/1",
                 self._body([1, 2, 3, 4], mat))
        assert r.status == 201
        state.index.close()
        from ucfp_tpu.index.embedded import EmbeddedBackend

        be = EmbeddedBackend(str(tmp_path / "db"))
        hits = asyncio.run(be.knn(1, [0.0, 0.0, 1.0, 0.0], 1))
        assert hits[0].record_id == 3
        be.close()

    def test_bad_bodies_400(self, tmp_path):
        import struct

        app, state = make_app(tmp_path)

        def post(body, query=""):
            return call(app, "POST", "/v1/ingest/embedding/batch/1",
                        body, query=query)

        assert post(b"\x00" * 4).status == 400  # truncated header
        # odd byte_len (not f32-aligned)
        assert post(struct.pack("<QI", 1, 3) + b"abc").status == 400
        # non-uniform rows: row 1 has a different dim
        good = struct.pack("<QI", 1, 8) + b"\x00" * 8
        bad2 = struct.pack("<QI", 2, 4) + b"\x00" * 4
        r = post(good + bad2)
        assert r.status == 400
        # body doesn't tile (trailing garbage)
        assert post(good + b"\xff").status == 400
        # non-finite row named in the error
        mat = np.ones((3, 2), np.float32)
        mat[1, 0] = np.inf
        r = post(self._body([5, 6, 7], mat))
        assert r.status == 400 and b"record_id 6" in r.body
        # bad modality
        assert post(good, query="modality=nope").status == 400
        state.index.close()

    def test_row_cap_enforced(self, tmp_path):
        from ucfp_tpu.server.handlers import MAX_EMB_BATCH

        app, state = make_app(tmp_path)
        n = MAX_EMB_BATCH + 1
        body = self._body(range(n), np.zeros((n, 1), np.float32))
        r = call(app, "POST", "/v1/ingest/embedding/batch/1", body)
        assert r.status == 400 and b"exceeds" in r.body
        state.index.close()

    def test_batch_literal_not_captured_as_tenant(self, tmp_path):
        app, state = make_app(tmp_path)
        mat = np.ones((2, 2), np.float32)
        r = call(app, "POST", "/v1/ingest/embedding/batch/0",
                 self._body([1, 2], mat))
        assert r.status == 201
        # duplicate rid inside one batch: per-record last-write-wins
        m2 = np.stack([np.ones(2), 2 * np.ones(2)]).astype(np.float32)
        r = call(app, "POST", "/v1/ingest/embedding/batch/0",
                 self._body([9, 9], m2))
        assert r.status == 201
        d = jbody(call(app, "GET", "/v1/records/0/9",
                       query="include=embedding"))
        assert d["embedding"] == [2.0, 2.0]
        state.index.close()


class TestIngestCoalesce:
    """Cross-request coalescing on the bulk image route: concurrent
    batch requests share one device launch; fingerprints must be
    byte-identical to the per-request path (padding rows are discarded,
    hash kernels are row-independent)."""

    @staticmethod
    def _frames(pairs):
        import struct

        out = bytearray()
        for rid, img in pairs:
            out += struct.pack("<QI", rid, len(img))
            out += img
        return bytes(out)

    def _ingest_pair(self, app):
        f1 = self._frames([(1, synthetic_png(64, 64)),
                           (2, synthetic_png(32, 32))])
        f2 = self._frames([(3, synthetic_png(64, 64)),
                           (4, synthetic_png(48, 48))])

        async def go():
            (r1, _), (r2, _) = await asyncio.gather(
                app.handle_request(req(
                    "POST", "/v1/ingest/image/batch/0", f1,
                    query="algorithm=phash")),
                app.handle_request(req(
                    "POST", "/v1/ingest/image/batch/0", f2,
                    query="algorithm=phash")),
            )
            return r1, r2

        r1, r2 = asyncio.run(go())
        assert r1.status == 201 and r2.status == 201
        out = {}
        for r in (r1, r2):
            for rec in jbody(r)["records"]:
                out[rec["record_id"]] = rec["fingerprint_hex"]
        return out

    def test_coalesced_matches_direct(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_INGEST_COALESCE_MS", "2")
        app, state = make_app(tmp_path / "a")
        coalesced = self._ingest_pair(app)

        monkeypatch.setenv("UCFP_INGEST_COALESCE_MS", "0")
        app2, _ = make_app(tmp_path / "b")
        direct = self._ingest_pair(app2)
        assert coalesced == direct and len(coalesced) == 4

    def test_pad_max_matches_pow2(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_INGEST_COALESCE_MS", "2")
        monkeypatch.setenv("UCFP_INGEST_PAD", "max")
        monkeypatch.setenv("UCFP_INGEST_COALESCE_ROWS", "64")
        app, _ = make_app(tmp_path / "a")
        padded = self._ingest_pair(app)

        monkeypatch.delenv("UCFP_INGEST_PAD")
        monkeypatch.delenv("UCFP_INGEST_COALESCE_ROWS")
        monkeypatch.setenv("UCFP_INGEST_COALESCE_MS", "0")
        app2, _ = make_app(tmp_path / "b")
        assert padded == self._ingest_pair(app2)

    def test_coalesce_counters_visible(self, tmp_path, monkeypatch):
        monkeypatch.setenv("UCFP_INGEST_COALESCE_MS", "2")
        app, _ = make_app(tmp_path / "a")
        self._ingest_pair(app)
        h = app.router.match("POST", "/v1/ingest/image/batch/0")[0].__self__
        assert h.ingest_coalesce_flushes >= 1
        assert h.ingest_coalesce_groups >= 2


class TestVectorValidation:
    """The vectorized (set-of-types / np.isfinite) validators must keep
    the exact old per-element semantics: JSON bools, nested lists,
    strings, and non-finite floats are 400s, never 500s."""

    def test_query_vector_rejects_bools_and_nested(self, tmp_path):
        app, _ = make_app(tmp_path)
        for bad in ([True, 1.0], [1.0, [2.0]], ["1.0"], [None, 1.0]):
            resp = call(app, "POST", "/v1/query",
                        json.dumps({"tenant_id": 0, "modality": "text",
                                    "k": 5, "vector": bad}).encode())
            assert resp.status == 400, bad
            assert jbody(resp)["error"] == "bad_query"

    def test_query_vector_accepts_ints_and_floats(self, tmp_path):
        app, _ = make_app(tmp_path)
        resp = call(app, "POST", "/v1/query",
                    json.dumps({"tenant_id": 0, "modality": "text",
                                "k": 5, "vector": [1, 2.5, -3]}).encode())
        assert resp.status == 200

    def test_upsert_embedding_rejects_nan_and_bool(self, tmp_path):
        app, _ = make_app(tmp_path)
        base = {"tenant_id": 0, "record_id": 7, "modality": "text",
                "algorithm": "t", "fingerprint": [1, 2, 3]}
        for emb in ([float("nan")], [float("inf")], [True], ["x"],
                    [[1.0]], []):
            resp = call(app, "POST", "/v1/records",
                        json.dumps({**base, "embedding": emb}).encode())
            assert resp.status == 400, emb

    def test_upsert_embedding_accepts_mixed_int_float(self, tmp_path):
        app, _ = make_app(tmp_path)
        body = {"tenant_id": 0, "record_id": 8, "modality": "text",
                "algorithm": "t", "fingerprint": [1, 2, 3],
                "embedding": [1, 2.5, -3]}
        resp = call(app, "POST", "/v1/records", json.dumps(body).encode())
        assert resp.status in (200, 201)
