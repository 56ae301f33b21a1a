"""End-to-end tests for the Python client SDK (clients/python).

Unlike test_server.py (in-process router, no sockets), these start the
real asyncio HTTP front on a loopback port and drive it through the
shipped `ucfp` client package — sync, async, and bulk — so the full
wire path (URL building, auth header, error envelope, Retry-After,
NDJSON streaming) is what's under test.
"""

import asyncio
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "clients" / "python"))

from ucfp import (  # noqa: E402
    Ucfp,
    UcfpAsync,
    UcfpError,
    bulk_text,
)
from ucfp._common import decode_wav  # noqa: E402

from ucfp_tpu.index.embedded import EmbeddedBackend
from ucfp_tpu.server.app import ServerState, build_server
from ucfp_tpu.server.auth import StaticSingleKey
from ucfp_tpu.server.inputs_cache import InputsCache
from ucfp_tpu.server.ratelimit import NoopRateLimiter, RateDecision, TenantRateLimiter
from ucfp_tpu.server.usage import NoopUsageSink

TOKEN = "sdk-test-token"


class DenyOnceLimiter(TenantRateLimiter):
    """Denies the first check per tenant, then allows — exercises the
    client's 429 retry with Retry-After."""

    def __init__(self):
        self.seen = set()
        self.denied = 0

    async def check(self, tenant_id: int, rate_class: str = "default") -> RateDecision:
        if tenant_id not in self.seen:
            self.seen.add(tenant_id)
            self.denied += 1
            return RateDecision(allowed=False, retry_after_ms=50)
        return RateDecision(allowed=True, remaining=100, reset_ms=1000)


class LiveServer:
    """Real asyncio HTTP front on 127.0.0.1:<ephemeral> in a thread."""

    def __init__(self, tmp_path, rate=None):
        self.state = ServerState(
            index=EmbeddedBackend(str(tmp_path / "db")),
            api_keys=StaticSingleKey(TOKEN),
            rate_limit=rate or NoopRateLimiter(),
            usage=NoopUsageSink(),
            inputs=InputsCache(),
        )
        self.app = build_server(self.state, timeout_secs=120.0)
        self.port = None
        self._loop = None
        self._started = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        assert self._started.wait(30), "server failed to start"

    def _run(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)

        async def boot():
            srv = await self.app.serve("127.0.0.1", 0)
            self.port = srv.sockets[0].getsockname()[1]
            self._started.set()

        self._loop.run_until_complete(boot())
        self._loop.run_forever()

    @property
    def base_url(self):
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._thread.join(timeout=10)


@pytest.fixture(scope="module")
def live(tmp_path_factory):
    srv = LiveServer(tmp_path_factory.mktemp("sdkdb"))
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def client(live):
    with Ucfp(api_key=TOKEN, base_url=live.base_url, timeout_s=120.0) as c:
        yield c


def wav_bytes(secs=1.0, sr=8000, freq=440.0, width=2):
    """Synthesize a PCM16 WAV container."""
    import io
    import wave

    t = np.arange(int(secs * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.25 * np.sin(2 * np.pi * 1200 * t)
    pcm = (x * 32767).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(sr)
        w.writeframes(pcm)
    return buf.getvalue()


class TestPublicRoutes:
    def test_healthz_info_algorithms(self, client):
        assert client.healthz()["status"] == "ok"
        info = client.info()
        assert "crate_version" in info
        manifest = client.algorithms()
        assert "minhash" in str(manifest)


class TestText:
    def test_roundtrip_and_records(self, client):
        fp = client.text("The quick brown fox jumps over the lazy dog.",
                         record_id=101, tenant_id=7)
        assert fp.record_id == 101 and fp.tenant_id == 7
        assert fp.algorithm.startswith("minhash")
        assert fp.fingerprint_bytes == len(fp.fingerprint) > 0

        meta = client.get_record(101, tenant_id=7)
        assert meta.algorithm == fp.algorithm
        assert meta.fingerprint_bytes == fp.fingerprint_bytes

        client.delete_record(101, tenant_id=7)
        with pytest.raises(UcfpError) as ei:
            client.get_record(101, tenant_id=7)
        assert ei.value.status == 404
        assert ei.value.record_id == 101

    def test_tunables_and_query(self, client):
        docs = [
            "alpha bravo charlie delta echo",
            "alpha bravo charlie delta foxtrot",
            "completely different words here entirely",
        ]
        for i, d in enumerate(docs):
            fp = client.text(
                d, record_id=200 + i, tenant_id=7,
                h=64, k=3, tokenizer="word",
                canonicalizer={"case_fold": True, "normalization": "nfkc"},
            )
            assert fp.algorithm == "minhash-h64"
        res = client.query("text", terms=["alpha", "bravo"], k=5,
                           tenant_id=7, explain=True)
        got = {h.record_id for h in res.hits}
        assert {200, 201} <= got and 202 not in got
        assert res.hits[0].term_hits  # explain populated
        # recall_tier rides through the SDK; "exact" is valid in every
        # quant mode and an unknown tier surfaces the server's 400
        res = client.query("text", terms=["alpha"], k=5, tenant_id=7,
                           recall_tier="exact")
        assert any(h.record_id == 200 for h in res.hits)
        with pytest.raises(UcfpError) as ei:
            client.query("text", terms=["alpha"], k=5, tenant_id=7,
                         recall_tier="warp")
        assert ei.value.status == 400

    def test_get_record_include_fingerprint(self, client):
        fp = client.text("include fingerprint document", record_id=150,
                         tenant_id=7)
        meta = client.get_record(150, tenant_id=7, include="fingerprint")
        assert meta.fingerprint == fp.fingerprint
        plain = client.get_record(150, tenant_id=7)
        assert plain.fingerprint is None
        with pytest.raises(UcfpError) as ei:
            client.get_record(150, tenant_id=7, include="bogus")
        assert ei.value.status == 400
        client.delete_record(150, tenant_id=7)

    def test_auto_record_id(self, client):
        fp = client.text("auto id document", tenant_id=7)
        assert fp.record_id > 0
        client.delete_record(fp.record_id, tenant_id=7)

    def test_stream_chunks(self, client):
        fp = client.text_stream_chunks(
            ["the quick brown ", "fox jumps over ", "the lazy dog"],
            record_id=300, tenant_id=7,
        )
        whole = client.text("the quick brown fox jumps over the lazy dog",
                            record_id=301, tenant_id=7)
        assert fp.fingerprint_hex == whole.fingerprint_hex

    def test_text_batch(self, client):
        out = client.text_batch(
            [(601, "alpha batch doc one"), (602, "beta batch doc two")],
            tenant_id=7,
        )
        assert [r["record_id"] for r in out.records] == [601, 602]
        assert out.errors == []
        single = client.text("alpha batch doc one", record_id=603,
                             tenant_id=7)
        assert out.records[0]["fingerprint_hex"] == single.fingerprint_hex
        # partial success commits the valid rows AND returns the errors
        mixed = client.text_batch([(604, ""), (605, "good doc body")],
                                  tenant_id=7)
        assert [r["record_id"] for r in mixed.records] == [605]
        assert len(mixed.errors) == 1 and mixed.errors[0]["line"] == 1
        assert client.get_record(605, tenant_id=7).algorithm == \
            "minhash-h128"
        # all rows failed -> 400 with the envelope fields
        with pytest.raises(UcfpError) as ei:
            client.text_batch([(606, "")], tenant_id=7)
        assert ei.value.status == 400 and ei.value.code == "batch_failed"
        with pytest.raises(ValueError):
            client.text_batch([(i, "x") for i in range(1025)])

    def test_text_stream_iterates(self, client):
        fps = list(client.text_stream(
            ["doc one body", "doc two body"], tenant_id=7))
        assert len(fps) == 2 and fps[0].record_id != fps[1].record_id


class TestImage:
    def test_phash_and_query(self, client):
        from test_imagehash import synthetic_png

        png = synthetic_png(64, 64)
        fp = client.image(png, algorithm="phash", record_id=400, tenant_id=7)
        assert fp.fingerprint_bytes == 8
        res = client.query("image", fingerprint=fp.fingerprint,
                           algorithm=fp.algorithm, k=3, tenant_id=7)
        assert res.hits and res.hits[0].record_id == 400

    def test_preprocess_validation(self, client):
        from test_imagehash import synthetic_png

        with pytest.raises(UcfpError) as ei:
            client.image(synthetic_png(64, 64), algorithm="phash",
                         tenant_id=7, preprocess={"min_dimension": 128})
        assert ei.value.status == 400

    def test_unknown_preprocess_knob_is_local_error(self, client):
        with pytest.raises(ValueError):
            client.image(b"x", preprocess={"bogus": 1})

    def test_image_batch(self, client):
        from test_imagehash import synthetic_png

        imgs = [(901, synthetic_png(64, 64)), (902, synthetic_png(32, 32))]
        recs = client.image_batch(imgs, algorithm="phash", tenant_id=7)
        assert [r["record_id"] for r in recs] == [901, 902]
        # matches the single-image route byte for byte
        single = client.image(synthetic_png(64, 64), algorithm="phash",
                              record_id=903, tenant_id=7)
        assert recs[0]["fingerprint_hex"] == single.fingerprint_hex

    def test_image_batch_size_cap_local(self, client):
        with pytest.raises(ValueError):
            client.image_batch([(i, b"x") for i in range(1025)])

    def test_embedding_batch(self, client):
        import numpy as np

        mat = np.eye(3, 6, dtype=np.float32)
        out = client.embedding_batch(
            [(921, mat[0]), (922, mat[1].tolist()), (923, mat[2])],
            model_id="bge", tenant_id=7,
        )
        assert out == {"count": 3, "dim": 6,
                       "algorithm": "embedding-local"}
        res = client.query("text", vector=mat[1].tolist(), k=1,
                           tenant_id=7,
                           filter={"algorithm": "embedding-local",
                                   "model_id": "bge"})
        assert res.hits[0].record_id == 922

    def test_embedding_batch_size_cap_local(self, client):
        with pytest.raises(ValueError):
            client.embedding_batch([(i, [0.0]) for i in range(4097)])

    def test_audio_batch(self, client):
        import numpy as np

        t = np.arange(8000, dtype=np.float32) / 8000.0
        a = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
        b = np.sin(2 * np.pi * 660.0 * t).astype(np.float32)
        recs = client.audio_batch(
            [(911, a), (912, b)], sample_rate=8000, algorithm="wang",
            tenant_id=7,
        )
        assert [r["record_id"] for r in recs] == [911, 912]
        single = client.audio(a, sample_rate=8000, algorithm="wang",
                              record_id=913, tenant_id=7)
        assert recs[0]["fingerprint_hex"] == single.fingerprint_hex

    def test_audio_batch_size_cap_local(self, client):
        with pytest.raises(ValueError):
            client.audio_batch([(i, b"\x00" * 4) for i in range(257)],
                               sample_rate=8000)

    def test_query_batch_fingerprints(self, client):
        from test_imagehash import synthetic_png

        # sizes unused elsewhere in this module: synthetic_png is
        # deterministic, so reusing 64x64 would tie with earlier
        # records' fingerprints and lose the top slot on record-id order
        a = client.image(synthetic_png(56, 56), algorithm="phash",
                         record_id=910, tenant_id=7)
        b = client.image(synthetic_png(40, 40), algorithm="phash",
                         record_id=911, tenant_id=7)
        # friendly alias + bytes/hex mix, one shared device dispatch
        res = client.query_batch(
            "image", fingerprints=[b.fingerprint, a.fingerprint_hex],
            algorithm="phash", k=3, tenant_id=7,
        )
        assert res.results[0][0].record_id == 911
        assert res.results[1][0].record_id == 910

    def test_query_batch_vectors_and_validation(self, client):
        for rid, vec in ((920, [1.0, 0.0, 0.0]), (921, [0.0, 1.0, 0.0])):
            client.text(f"vec doc {rid}", record_id=rid, tenant_id=7,
                        algorithm="semantic")
        # embeddings come from the seeded encoder; query each record's
        # own embedding back
        e920 = client.get_record(920, tenant_id=7, include="embedding")
        e921 = client.get_record(921, tenant_id=7, include="embedding")
        res = client.query_batch(
            "text", vectors=[e921.embedding, e920.embedding], k=2,
            tenant_id=7,
        )
        assert res.results[0][0].record_id == 921
        assert res.results[1][0].record_id == 920
        with pytest.raises(ValueError):
            client.query_batch("text")  # neither vectors nor fingerprints
        with pytest.raises(ValueError):
            client.query_batch("image", fingerprints=[b"\x00" * 8])  # no algo


class TestAudio:
    def test_raw_f32(self, client):
        t = np.arange(16000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 0.7 * t) > 0))
        fp = client.audio(x.astype("<f4").tobytes(), sample_rate=8000,
                          record_id=500, tenant_id=7)
        assert fp.algorithm == "audiofp-wang-v1"
        assert fp.fingerprint_bytes > 0

    def test_wav_container_decoded_client_side(self, client):
        fp = client.audio(wav_bytes(secs=1.0, sr=8000), record_id=501,
                          tenant_id=7)  # sample_rate from the WAV header
        assert fp.algorithm == "audiofp-wang-v1"

    def test_numpy_array_accepted(self, client):
        t = np.arange(8000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 900 * t)
        fp = client.audio(x, sample_rate=8000, record_id=502, tenant_id=7,
                          algorithm="haitsma")
        assert fp.algorithm == "audiofp-haitsma-v1"

    def test_watermark_report(self, client):
        t = np.arange(8000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype("<f4")
        rep = client.audio_watermark(x.tobytes(), key="tenant-7-wm-secret",
                                     sample_rate=8000, tenant_id=7)
        assert isinstance(rep.detected, bool)
        assert 0.0 <= rep.confidence <= 1.0

    def test_audio_stream_segments(self, client):
        t = np.arange(4 * 8000) / 8000.0
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.3 * np.sin(2 * np.pi * 1500 * t) * (np.sin(2 * np.pi * 1.1 * t) > 0)
             ).astype("<f4").tobytes()
        chunks = [x[i:i + 16000] for i in range(0, len(x), 16000)]
        out = client.audio_stream(chunks, sample_rate=8000, record_id=510,
                                  tenant_id=7, segment_secs=2.0)
        assert out.segments >= 1
        assert all("record_id" in r for r in out.records)


class TestWavDecode:
    def test_pcm16_roundtrip(self):
        pcm, sr = decode_wav(wav_bytes(secs=0.25, sr=8000))
        assert sr == 8000
        x = np.frombuffer(pcm, dtype="<f4")
        assert len(x) == 2000
        assert 0.4 < np.abs(x).max() <= 1.0


class TestErrors:
    def test_error_fields(self, client):
        with pytest.raises(UcfpError) as ei:
            client.text(b"\xff\xfe invalid utf8", record_id=600, tenant_id=7)
        e = ei.value
        assert e.status == 400 and e.code == "bad_utf8" and e.message

    def test_auth_failure_no_retry_storm(self, live):
        bad = Ucfp(api_key="wrong", base_url=live.base_url, retries=3)
        t0 = time.time()
        with pytest.raises(UcfpError) as ei:
            bad.healthz()  # public: fine
            bad.text("x", tenant_id=7)
        assert ei.value.status == 401
        assert time.time() - t0 < 5  # 401 must not be retried
        bad.close()

    def test_429_retry_honours_retry_after(self, tmp_path):
        rate = DenyOnceLimiter()
        srv = LiveServer(tmp_path, rate=rate)
        try:
            c = Ucfp(api_key=TOKEN, base_url=srv.base_url,
                     retries=2, timeout_s=120.0)
            fp = c.text("retried after a deny", record_id=700, tenant_id=3)
            assert fp.record_id == 700
            assert rate.denied == 1  # first call was denied, retry landed
            c.close()
        finally:
            srv.stop()


class TestAsyncClient:
    def test_async_mirror(self, live):
        async def go():
            async with UcfpAsync(api_key=TOKEN, base_url=live.base_url,
                                 timeout_s=120.0) as c:
                fp = await c.text("async client document", record_id=800,
                                  tenant_id=9)
                assert fp.record_id == 800
                meta = await c.get_record(800, tenant_id=9)
                assert meta.algorithm == fp.algorithm
                res = await c.query("text", terms=["async"], k=3, tenant_id=9)
                assert any(h.record_id == 800 for h in res.hits)

                fps = []
                async for f in c.text_stream(
                    ["stream a", "stream b", "stream c"],
                    concurrency=2, tenant_id=9,
                ):
                    fps.append(f)
                assert len(fps) == 3
                await c.delete_record(800, tenant_id=9)

        asyncio.run(go())


class TestCli:
    def test_cli_text_query_get_delete(self, live, capsys):
        from ucfp.__main__ import main

        base = ["--api-key", TOKEN, "--base-url", live.base_url,
                "--tenant", "7"]
        assert main(base + ["text", "cli ingested document text",
                            "--record-id", "9001"]) == 0
        fp = json.loads(capsys.readouterr().out)
        assert fp["record_id"] == 9001 and fp["fingerprint_bytes"] > 0

        assert main(base + ["query", "--modality", "text",
                            "--terms", "cli", "document", "-k", "3"]) == 0
        res = json.loads(capsys.readouterr().out)
        assert any(h["record_id"] == 9001 for h in res["hits"])

        assert main(base + ["get", "9001", "--include", "fingerprint"]) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["fingerprint_hex"] == fp["fingerprint_hex"]

        assert main(base + ["delete", "9001"]) == 0
        capsys.readouterr()
        rc = main(base + ["get", "9001"])
        assert rc == 1
        err = json.loads(capsys.readouterr().err)
        assert err["status"] == 404

    def test_cli_requires_key_for_protected(self, capsys, monkeypatch):
        from ucfp.__main__ import main

        monkeypatch.delenv("UCFP_API_KEY", raising=False)
        assert main(["text", "x"]) == 2

    def test_cli_public_info(self, live, capsys):
        from ucfp.__main__ import main

        assert main(["--base-url", live.base_url, "info"]) == 0
        assert "crate_version" in json.loads(capsys.readouterr().out)


class TestBulk:
    def test_bulk_text_order_and_errors(self, client):
        docs = [f"bulk document number {i} content" for i in range(6)]
        docs.insert(3, b"\xff\xfe broken")  # one bad input mid-batch
        seen = []
        results = bulk_text(
            client, docs, concurrency=4, tenant_id=7,
            progress=lambda done, total: seen.append((done, total)),
        )
        assert len(results) == 7
        ok = [r for r in results if r.error is None]
        bad = [r for r in results if r.error is not None]
        assert len(ok) == 6 and len(bad) == 1
        assert bad[0].source.index == 3
        assert bad[0].error.status == 400
        # documented unpacking shape: (fp, source)
        fp, src = results[0]
        assert fp.record_id > 0 and src.index == 0
        assert seen[-1] == (7, 7)
