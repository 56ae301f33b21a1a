"""Robustness: raw-socket HTTP fuzz, concurrent backend access, large
hybrid corpus, MinHash Jaccard property."""

import asyncio
import socket

import numpy as np
import pytest

from ucfp_tpu.core import Modality, Query, Record
from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.matcher import Matcher
from ucfp_tpu.modality import text as tmod
from ucfp_tpu.ops import textsig


def run(coro):
    return asyncio.run(coro)


class TestHttpFuzz:
    """Drive the real socket server with malformed input."""

    @pytest.fixture
    def server(self, tmp_path):
        from ucfp_tpu.server.app import ServerState, build_server
        from ucfp_tpu.server.auth import StaticSingleKey
        from ucfp_tpu.server.inputs_cache import InputsCache
        from ucfp_tpu.server.ratelimit import NoopRateLimiter
        from ucfp_tpu.server.usage import NoopUsageSink

        state = ServerState(
            index=EmbeddedBackend(str(tmp_path)),
            api_keys=StaticSingleKey("t"),
            rate_limit=NoopRateLimiter(),
            usage=NoopUsageSink(),
            inputs=InputsCache(),
        )
        srv = build_server(state, timeout_secs=30.0)

        async def scenario(fn):
            s = await srv.serve("127.0.0.1", 0)
            port = s.sockets[0].getsockname()[1]
            try:
                return await asyncio.wait_for(fn(port), timeout=20)
            finally:
                s.close()
                await s.wait_closed()

        return scenario

    def _send_raw(self, port, payload: bytes) -> bytes:
        with socket.create_connection(("127.0.0.1", port), timeout=5) as sk:
            sk.sendall(payload)
            sk.settimeout(5)
            out = b""
            try:
                while True:
                    chunk = sk.recv(4096)
                    if not chunk:
                        break
                    out += chunk
            except socket.timeout:
                pass
            return out

    def test_garbage_request_line(self, server):
        async def go(port):
            return await asyncio.to_thread(
                self._send_raw, port, b"NONSENSE\r\n\r\n"
            )

        out = run(server(go))
        assert b"400" in out.split(b"\r\n")[0]

    def test_oversized_body_413(self, server):
        async def go(port):
            head = (
                b"POST /v1/ingest/text/0/1 HTTP/1.1\r\n"
                b"authorization: Bearer t\r\n"
                b"content-length: 999999999\r\n\r\n"
            )
            return await asyncio.to_thread(self._send_raw, port, head)

        out = run(server(go))
        assert b"413" in out.split(b"\r\n")[0]

    def test_keepalive_two_requests(self, server):
        async def go(port):
            req = (
                b"GET /healthz HTTP/1.1\r\nhost: x\r\n\r\n"
                b"GET /v1/info HTTP/1.1\r\nhost: x\r\nconnection: close\r\n\r\n"
            )
            return await asyncio.to_thread(self._send_raw, port, req)

        out = run(server(go))
        assert out.count(b"HTTP/1.1 200") == 2
        assert b'"name":"ucfp-tpu"' in out

    def test_half_request_then_close(self, server):
        async def go(port):
            def partial():
                with socket.create_connection(("127.0.0.1", port), timeout=5) as sk:
                    sk.sendall(b"POST /v1/query HTTP/1.1\r\ncontent-le")
                return True  # server must not crash

            ok = await asyncio.to_thread(partial)
            # server still serves afterwards
            return ok, await asyncio.to_thread(
                self._send_raw, port,
                b"GET /healthz HTTP/1.1\r\nconnection: close\r\n\r\n",
            )

        ok, out = run(server(go))
        assert ok and b"200" in out


class TestConcurrency:
    def test_concurrent_upserts_and_queries(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))

        import math

        def vec(rid):  # distinct unit directions so cosine peaks at rid
            th = rid * 0.001
            return [math.cos(th), math.sin(th)]

        async def go():
            async def writer(base):
                for i in range(20):
                    await b.upsert([
                        Record(0, base + i, Modality.TEXT, "e", b"\x01",
                               embedding=vec(base + i),
                               text=f"doc {base + i} payload")
                    ])

            async def reader():
                for _ in range(30):
                    await b.knn(0, [1.0, 1.0], 5)
                    await b.bm25(0, ["payload"], 5)

            await asyncio.gather(writer(0), writer(1000), writer(2000),
                                 reader(), reader())

        run(go())
        hits = run(b.knn(0, vec(2019), 1))
        import os

        if os.environ.get("UCFP_KNN_QUANT") in ("int8", "sketch"):
            # adjacent 0.001-rad directions quantize to the same int8
            # vector (step ~1/127 = 0.008 rad); ties resolve to the
            # lowest id, so accept the quantization neighbourhood
            assert abs(hits[0].record_id - 2019) <= 16
            assert hits[0].score > 0.999
        else:
            assert hits[0].record_id == 2019
        assert len(run(b.bm25(0, ["payload"], 100))) == 60


class TestLargeCorpus:
    def test_hybrid_search_1000_docs(self, tmp_path):
        b = EmbeddedBackend(str(tmp_path))
        rng = np.random.default_rng(0)
        recs = []
        for rid in range(1000):
            vec = rng.normal(size=8)
            vec /= np.linalg.norm(vec)
            topic = ["alpha", "beta", "gamma", "delta"][rid % 4]
            recs.append(Record(0, rid, Modality.TEXT, "e", b"\x01",
                               embedding=[float(x) for x in vec],
                               text=f"{topic} document number {rid}"))
        run(b.upsert(recs))
        target = np.asarray(recs[777].embedding)
        q = Query(0, Modality.TEXT, k=10,
                  vector=[float(x) for x in target], terms=["alpha"])
        hits = run(Matcher(b).search(q))
        assert len(hits) == 10
        # 777 is rank 1 in the vector leg; if it also matches "alpha"
        # (777 % 4 == 1 -> beta, so vector-only contribution) it must
        # still appear in the fused top-10
        assert 777 in [h.record_id for h in hits]


class TestMinhashProperty:
    def test_signature_similarity_tracks_jaccard(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(400)]
        base = list(rng.choice(vocab, size=200, replace=False))
        for replace_n in (20, 80, 160):
            other = list(base)
            repl = rng.choice(400, size=replace_n, replace=False)
            for i, r in enumerate(repl):
                other[i % len(other)] = f"x{r}"
            s1 = set(tmod.shingles_of(base, 3))
            s2 = set(tmod.shingles_of(other, 3))
            true_j = len(s1 & s2) / len(s1 | s2)
            sig1 = textsig.minhash_signature(list(s1))
            sig2 = textsig.minhash_signature(list(s2))
            est = textsig.minhash_similarity(sig1, sig2)
            # 128 slots -> stderr ~ sqrt(j(1-j)/128) <= 0.045
            assert abs(est - true_j) < 0.15


class TestAdviceRegressions:
    """Regression coverage for the round-2 advisor findings."""

    def test_stale_bm25_hit_skipped_not_404(self, tmp_path):
        """A record deleted between the BM25 scan and the metadata filter
        pass is dropped from the results, not surfaced as RecordNotFound."""
        b = EmbeddedBackend(str(tmp_path))

        async def go():
            await b.upsert([
                Record(0, 1, Modality.TEXT, "minhash-h128", b"\x01",
                       text="shared corpus words"),
                Record(0, 2, Modality.TEXT, "simhash-b64-tf", b"\x02",
                       text="shared corpus words"),
            ])

            class RacyIndex:
                """Delegates to the real backend but deletes record 2
                after BM25 returns, before the filter's metadata pass."""

                def __getattr__(self, name):
                    return getattr(b, name)

                async def bm25(self, tenant_id, terms, k):
                    hits = await b.bm25(tenant_id, terms, k)
                    await b.delete(tenant_id, [2])
                    return hits

            m = Matcher(RacyIndex())
            q = Query(tenant_id=0, modality=Modality.TEXT, k=10,
                      terms=["corpus"],
                      filter={"algorithm": "minhash-h128"})
            return await m.search(q)

        hits = run(go())
        assert [h.record_id for h in hits] == [1]

    def test_scope_prefix_anchored_to_segments(self):
        from ucfp_tpu.server.auth import required_scope

        assert required_scope("/v1/records/0/1") == "records"
        assert required_scope("/v1/records") == "records"
        # a sibling route sharing the string prefix must NOT inherit it
        assert required_scope("/v1/recordsets/0") is None
        assert required_scope("/v1/inputsfoo") is None
        assert required_scope("/v1/inputs/0") == "ingest"
        assert required_scope("/v1/ingest/text/0/1") == "ingest"
